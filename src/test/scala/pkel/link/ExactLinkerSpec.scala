package pkel.link

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.eval.Metrics
import pkel.io.MentionReader
import pkel.ontology.Ontology
import pkel.text.PkTokenizer

class ExactLinkerSpec extends SparkSpec {

  lazy val entries = Ontology.load()
  lazy val index = Ontology.blockingIndex(entries)

  test("ontology loads 75 non-NIL entries with expected category sizes") {
    assert(entries.size == 75)
    val byCat = entries.groupBy(_.categoryId).view.mapValues(_.size).toMap
    assert(byCat == Map("G1" -> 9, "G2" -> 5, "G3" -> 15, "G4" -> 10, "G5" -> 6,
      "G6" -> 7, "G7" -> 7, "G8" -> 9, "G9" -> 7))
  }

  test("ontology self-test: every entry's own name lands on an index key containing its id") {
    val idx = index.toMap
    val misses = entries.flatMap { e =>
      val key = PkTokenizer.blockingKey(e.parameterName)
      idx.get(key) match {
        case Some(ids) if ids.contains(e.parameterId) => None
        case other => Some(s"${e.parameterId} '${e.parameterName}' key='$key' → $other")
      }
    }
    assert(misses.isEmpty, misses.mkString("\n"))
  }

  test("exact tier end-to-end on sentence fixtures") {
    val mentions = MentionReader.readJsonl(spark, resourcePath("/pkel/data/sentences/test.jsonl"), isTable = false)
    assert(mentions.count() == 293)
    val keyed = ExactLinker.withBlockingKey(mentions)
    val linked = ExactLinker.link(spark, keyed, index).cache()

    val byStatus = linked.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"status counts: $byStatus")

    // evaluation over emitted predictions only (reference scores linked+excluded)
    val emitted = linked.filter(col("status").isin(
      ExactLinker.StatusLinked, ExactLinker.StatusDisambiguated,
      ExactLinker.StatusTableDefault, ExactLinker.StatusExcluded))
    val m = Metrics.evaluate(emitted.select(col("label").as("y_true"), col("y_pred")))
    info(f"exact tier micro-F1 on matched+excluded: ${m.micF1}%.4f over ${m.n} mentions")
    info(f"macro-F1: ${m.macF1}%.4f")

    // residue should flow to the next tier
    val residue = linked.filter(col("status").isin(ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))
    info(s"residue: ${residue.count()}")

    assert(m.n > 150, "exact tier should emit predictions for most mentions")
    assert(m.micF1 > 0.85, f"exact tier micro-F1 regressed: ${m.micF1}%.4f")
  }

  test("exact tier end-to-end on table fixtures") {
    val mentions = MentionReader.readJsonl(spark, resourcePath("/pkel/data/tables/test.jsonl"), isTable = true)
    assert(mentions.count() == 275)
    val keyed = ExactLinker.withBlockingKey(mentions)
    val linked = ExactLinker.link(spark, keyed, index).cache()
    val emitted = linked.filter(col("status").isin(
      ExactLinker.StatusLinked, ExactLinker.StatusDisambiguated,
      ExactLinker.StatusTableDefault, ExactLinker.StatusExcluded))
    val m = Metrics.evaluate(emitted.select(col("label").as("y_true"), col("y_pred")))
    info(f"tables exact micro-F1: ${m.micF1}%.4f over ${m.n}")
    assert(m.micF1 > 0.80, f"tables exact micro-F1 regressed: ${m.micF1}%.4f")
  }

  test("NIL exclusion and invalid-context kernels") {
    assert(ExactLinker.isNonPkMention("MIC"))
    assert(ExactLinker.isNonPkMention("AUC/MIC"))
    assert(ExactLinker.isNonPkMention("ic50"))
    assert(!ExactLinker.isNonPkMention("AUC"))
    // "CL" followed by "cr" → creatinine clearance context
    val t = "the CLcr was measured"
    assert(ExactLinker.isInInvalidContext(t, 4, 6))
    assert(!ExactLinker.isInInvalidContext("the CL was measured", 4, 6))
  }

  test("disambiguation: km and t1/2 context branches") {
    import pkel.text.BasicNormalizer
    def d(text: String, cands: Seq[String]) = ExactLinker.disambiguate(BasicNormalizer(text), cands)
    assert(d("the km (nmol/L) of the enzyme reaction", Seq("Q1", "Q51")) == Right("Q1"))
    assert(d("km was 3 1/h for elimination", Seq("Q1", "Q51")) == Right("Q51"))
    assert(d("km was 3", Seq("Q1", "Q51")) == Left(Seq("Q1")))
    assert(d("t1/2 in the two-compartment model", Seq("Q57", "Q60", "Q89")) == Right("Q60"))
    assert(d("gamma phase t1/2", Seq("Q57", "Q60", "Q89")) == Right("Q89"))
    assert(d("nca t1/2", Seq("Q57", "Q60", "Q89")) == Right("Q57"))
    assert(d("plain t1/2", Seq("Q57", "Q60", "Q89")) == Right("Q57"))
  }
}
