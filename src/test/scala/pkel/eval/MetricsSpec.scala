package pkel.eval

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.ontology.Ontology

/** Hand-computed fixtures for the evaluation aggregates added in round 2:
  * ontology-coverage EDA, n-run mean/std, and the single-pass per-source
  * evaluation. */
class MetricsSpec extends SparkSpec {

  import spark.implicits._

  lazy val entries = Ontology.load()

  test("runStats: mean and population std (numpy semantics)") {
    val s = Metrics.runStats(Seq(0.8, 0.9, 1.0))
    assert(math.abs(s.mean - 0.9) < 1e-12)
    assert(math.abs(s.std - math.sqrt(2.0 / 300.0)) < 1e-12) // sqrt(((.1)^2+0+(.1)^2)/3)
    assert(s.n == 3)
    assert(Metrics.runStats(Nil) == Metrics.RunStats(0.0, 0.0, 0))
  }

  test("evaluateRuns summarizes micro-F1 across runs") {
    val run1 = Seq(("a", "a"), ("b", "b")).toDF("y_true", "y_pred") // 1.0
    val run2 = Seq(("a", "a"), ("b", "a")).toDF("y_true", "y_pred") // 0.5
    val (per, stats) = Metrics.evaluateRuns(Seq(run1, run2))
    assert(per.map(_.micF1) == Seq(1.0, 0.5))
    assert(math.abs(stats.mean - 0.75) < 1e-12)
    assert(math.abs(stats.std - 0.25) < 1e-12)
  }

  test("evaluateBySource matches per-source evaluate, one pass") {
    val preds = Seq(
      ("dev", "a", "a"), ("dev", "a", "b"), ("dev", "b", "b"),
      ("unlinked", "a", "a"), ("unlinked", "c", "c"), ("unlinked", "c", "a"))
      .toDF("source", "y_true", "y_pred")
    val bySource = Metrics.evaluateBySource(preds)
    assert(bySource.keySet == Set("dev", "unlinked"))
    val dev = bySource("dev")
    val devDirect = Metrics.evaluate(preds.filter(col("source") === "dev").drop("source"))
    assert(dev.micF1 == devDirect.micF1 && dev.macF1 == devDirect.macF1 && dev.n == devDirect.n)
    val unl = bySource("unlinked")
    val unlDirect = Metrics.evaluate(preds.filter(col("source") === "unlinked").drop("source"))
    assert(unl.micF1 == unlDirect.micF1 && unl.macF1 == unlDirect.macF1)
  }

  test("ontologyCoverage: per-category covered counts, NIL row, distribution mass") {
    // labels: two params from the first entry's category, one NIL, one stray
    val cat = entries.head.parameterCategory
    val catIds = entries.filter(_.parameterCategory == cat).map(_.parameterId)
    val labels = (Seq(catIds.head, catIds.head, catIds(1), "Q100") :+ "QSTRAY")
      .toDF("label")
    val rows = Metrics.ontologyCoverage(spark, labels, entries).collect()
      .map(r => r.getAs[String]("category") -> r).toMap
    val catRow = rows(cat)
    assert(catRow.getAs[Long]("covered_params") == 2)
    assert(catRow.getAs[Long]("total_params") == catIds.size)
    assert(catRow.getAs[Long]("label_count") == 3)
    assert(catRow.getAs[Double]("distribution_pct") == 60.0) // 3 of 5 labels
    val nilRow = rows("NIL")
    assert(nilRow.getAs[Long]("covered_params") == 1 && nilRow.getAs[Long]("total_params") == 1)
    // every ontology category appears exactly once (+ NIL)
    assert(rows.size == entries.map(_.parameterCategory).distinct.size + 1)
    // uncovered categories report zero
    val uncovered = rows.values.filter(_.getAs[Long]("label_count") == 0)
    assert(uncovered.forall(r => r.getAs[Long]("covered_params") == 0))
  }

  test("analysisResults: per-split combined coverage/distribution/counter table") {
    val cat = entries.head.categoryId
    val catIds = entries.filter(_.categoryId == cat).map(_.parameterId).sorted
    // split s1: 2× first param, 1× second param, 1× NIL (4 labels);
    // split s2: 1× first param
    val s1 = Seq(catIds.head, catIds.head, catIds(1), "Q100").toDF("label")
    val s2 = Seq(catIds.head).toDF("label")
    val out = Metrics.analysisResults(spark, Seq("s1" -> s1, "s2" -> s2), entries).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("category")) -> r).toMap
    val r1 = out(("s1", cat))
    assert(r1.getAs[Long]("covered_params") == 2)
    assert(r1.getAs[Long]("total_params") == catIds.size)
    assert(r1.getAs[Long]("label_count") == 3)
    assert(r1.getAs[Long]("distribution_bp") == 7500L) // 3 of 4 labels
    assert(r1.getAs[Long]("coverage_bp") == math.floor(10000.0 * 2 / catIds.size).toLong)
    // the per-category Counter, canonicalized: count desc, then id asc
    assert(r1.getAs[String]("param_counts") == s"${catIds.head}:2,${catIds(1)}:1")
    // the NIL row IS get_single_label_stats(Q100): count + share
    val nil1 = out(("s1", "NIL"))
    assert(nil1.getAs[Long]("label_count") == 1 && nil1.getAs[Long]("distribution_bp") == 2500L)
    assert(nil1.getAs[String]("param_counts") == "Q100:1")
    val r2 = out(("s2", cat))
    assert(r2.getAs[Long]("label_count") == 1 && r2.getAs[Long]("distribution_bp") == 10000L)
    val nil2 = out(("s2", "NIL"))
    assert(nil2.getAs[Long]("label_count") == 0 && nil2.getAs[String]("param_counts") == "")
    // every ontology category (+ NIL) appears once per split, even if empty
    val nCats = entries.map(_.categoryId).distinct.size + 1
    assert(out.keys.count(_._1 == "s1") == nCats && out.keys.count(_._1 == "s2") == nCats)
  }

  test("confusionNormalized: row shares in basis points vs a hand-computed 3x3") {
    // true a: 2x a, 1x b  -> a row: a 6666bp, b 3333bp
    // true b: 1x b        -> b row: b 10000bp
    // true c: 1x a, 1x c  -> c row: a 5000bp, c 5000bp
    val preds = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"),
      ("c", "a"), ("c", "c")).toDF("y_true", "y_pred")
    val rows = Metrics.confusionNormalized(preds).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("row_total"), r.getAs[Long]("pct_bp"))).toMap
    assert(rows(("a", "a")) == ((2L, 3L, 6666L)))
    assert(rows(("a", "b")) == ((1L, 3L, 3333L)))
    assert(rows(("b", "b")) == ((1L, 1L, 10000L)))
    assert(rows(("c", "a")) == ((1L, 2L, 5000L)))
    assert(rows(("c", "c")) == ((1L, 2L, 5000L)))
    assert(rows.size == 5)
    // shares within a true-row sum to <= 10000 (floor) and > 10000 - rowsize
    val aRow = rows.collect { case ((t, _), v) if t == "a" => v._3 }.sum
    assert(aRow <= 10000 && aRow > 10000 - 2)
  }

  test("pairwiseF1Both matches the per-scope computations on a randomized table") {
    val rnd = new scala.util.Random(7)
    val golds = Array("Q1", "Q2", "Q3", "Q100")
    val preds = Array("Q1", "Q2", "Q3", "Q4", "Q100")
    val keys = Array("k1", "k2", "k3")
    val rows = Seq.fill(400)((
      golds(rnd.nextInt(golds.length)),
      preds(rnd.nextInt(preds.length)),
      keys(rnd.nextInt(keys.length))))
    val df = rows.toDF("gold", "pred", "blocking_key")
    val g = Metrics.pairwiseF1(df)
    val k = Metrics.pairwiseF1AtBlockingKey(df)
    val (gB, kB) = Metrics.pairwiseF1Both(df)
    assert(gB == g, s"global: $gB != $g")
    assert(kB == k, s"at-key: $kB != $k")
    // degenerate: all NIL
    val nil = Seq(("Q100", "Q100", "k1")).toDF("gold", "pred", "blocking_key")
    val (gN, kN) = Metrics.pairwiseF1Both(nil)
    assert(gN.tp == 0 && gN.goldPairs == 0 && gN.predPairs == 0)
    assert(kN.tp == 0 && kN.goldPairs == 0 && kN.predPairs == 0)
  }
}
