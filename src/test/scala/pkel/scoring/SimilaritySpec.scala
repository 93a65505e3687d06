package pkel.scoring

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  /** Seeded pseudo-random property harness (scalacheck-style, offline). */
  private def forAllStrings(n: Int)(check: (String, String) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abct12/λ %-"
    def gen(): String = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to n).foreach(_ => check(gen(), gen()))
  }

  test("indelRatio matches rapidfuzz.ratio reference values") {
    assert(Similarity.indelRatio("abc", "abc") == 100.0)
    assert(math.abs(Similarity.indelRatio("kitten", "sitting") - 61.53846153846154) < 1e-9)
    assert(math.abs(Similarity.indelRatio("abc", "abd") - 200.0 * 2 / 6) < 1e-9)
    assert(Similarity.indelRatio("", "") == 100.0)
    assert(Similarity.indelRatio("a", "") == 0.0)
  }

  test("tokenSetScore mirrors fuzzy_token_set_score") {
    // identical sets → 100
    assert(Similarity.tokenSetScore(Seq("auc", "inf"), Seq("auc", "inf")) == 100.0)
    // one of two tokens matches → 50
    assert(Similarity.tokenSetScore(Seq("auc", "xyzzy"), Seq("auc", "inf")) == 50.0)
    // denominator is max(|a|,|b|)
    assert(math.abs(Similarity.tokenSetScore(Seq("auc"), Seq("auc", "inf", "t")) * 3 - 100.0) < 1e-9)
  }

  test("jaroWinkler reference values") {
    assert(Similarity.jaroWinkler("MARTHA", "MARHTA") > 0.95)
    assert(Similarity.jaroWinkler("abc", "abc") == 1.0)
    assert(Similarity.jaroWinkler("abc", "xyz") == 0.0)
    assert(math.abs(Similarity.jaro("DWAYNE", "DUANE") - 0.82222222) < 1e-6)
  }

  test("levenshtein basics") {
    assert(Similarity.levenshtein("kitten", "sitting") == 3)
    assert(Similarity.levenshtein("", "abc") == 3)
    assert(Similarity.levenshteinSim("abc", "abc") == 1.0)
  }

  test("properties: symmetry, bounds, identity") {
    forAllStrings(500) { (a: String, b: String) =>
      val r = Similarity.indelRatio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(math.abs(r - Similarity.indelRatio(b, a)) < 1e-9)
      assert(Similarity.indelRatio(a, a) == 100.0)
      val jw = Similarity.jaroWinkler(a, b)
      assert(jw >= 0.0 && jw <= 1.0 + 1e-9)
      assert(math.abs(jw - Similarity.jaroWinkler(b, a)) < 1e-9)
      val lv = Similarity.levenshtein(a, b)
      assert(lv == Similarity.levenshtein(b, a))
      assert(lv <= math.max(a.length, b.length))
    }
  }

  test("cosine/dot on normalized vectors") {
    val e = Embedder.default
    val v1 = e.encode("hepatic clearance")
    val v2 = e.encode("hepatic clearance")
    val v3 = e.encode("volume of distribution")
    assert(math.abs(Similarity.dot(v1, v2) - 1.0) < 1e-5)
    assert(Similarity.dot(v1, v3) < 0.9)
    // deterministic across instances
    val e2 = new Embedder(384)
    assert(e2.encode("AUC0-inf").toSeq == e.encode("AUC0-inf").toSeq)
    // similar surface forms are closer than unrelated ones
    val auc1 = e.encode("[PARAM] auc [SYN] area under the curve")
    val auc2 = e.encode("area under curve")
    val vol = e.encode("peripheral volume of distribution")
    assert(Similarity.dot(auc1, auc2) > Similarity.dot(auc1, vol))
  }
}
