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
}
