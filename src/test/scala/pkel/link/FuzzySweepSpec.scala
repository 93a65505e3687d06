package pkel.link

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.blocking.CategoryBlocker
import pkel.eval.Metrics
import pkel.io.MentionReader
import pkel.ontology.Ontology
import pkel.text.Tokenizers

/** Mirrors the reference's fuzzy-threshold tuning sweep
  * (`scripts/linking/tuning/tune_fuzzy_linker.py:70`: thresholds
  * {50,60,70,80,90}) over the exact-tier residue, and exercises the
  * registry + per-source evaluation surfaces. */
class FuzzySweepSpec extends SparkSpec {

  lazy val entries = Ontology.load()
  lazy val index = Ontology.blockingIndex(entries)

  test("tokenizer registry resolves and rejects") {
    assert(Tokenizers("pk")("AUC0-∞") == Seq("auc", "inf"))
    assert(Tokenizers("basic")("the AUC value") == Seq("auc", "value"))
    intercept[IllegalArgumentException](Tokenizers("scispacy"))
  }

  test("fuzzy threshold sweep: matched count decreases monotonically with threshold") {
    val mentions = MentionReader.readJsonl(spark, resourcePath("/pkel/data/sentences/test.jsonl"), isTable = false)
    val keyed = ExactLinker.withBlockingKey(mentions)
    val exact = ExactLinker.link(spark, keyed, index)
    val residue = CategoryBlocker.withSubsets(
      exact.filter(col("status").isin(ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))
        .drop("y_pred", "status", "tier"), entries)

    val sweep = Seq(50.0, 60.0, 70.0, 80.0, 90.0).map { thr =>
      val out = FuzzyLinker.link(spark, residue, index, k = 10, matchThreshold = thr).cache()
      val matched = out.filter(col("status") === "linked").count()
      val m = Metrics.evaluate(out.select(col("label").as("y_true"), col("y_pred")))
      info(f"threshold $thr%.0f: matched=$matched micro-F1=${m.micF1}%.3f")
      (thr, matched)
    }
    sweep.sliding(2).foreach { case Seq((t1, m1), (t2, m2)) =>
      assert(m2 <= m1, s"matched count increased from thr=$t1 ($m1) to thr=$t2 ($m2)")
    }
  }

  test("retrieval metrics: MRR and recall@k over fuzzy candidates") {
    val mentions = MentionReader.readJsonl(spark, resourcePath("/pkel/data/sentences/test.jsonl"), isTable = false)
    val keyed = ExactLinker.withBlockingKey(mentions)
    val exact = ExactLinker.link(spark, keyed, index)
    val residue = CategoryBlocker.withSubsets(
      exact.filter(col("status").isin(ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))
        .drop("y_pred", "status", "tier"), entries)
    val out = FuzzyLinker.link(spark, residue, index, k = 10, matchThreshold = 50.0)
    val r = Metrics.evaluateRetrieval(out.select(col("label").as("y_true"), col("pred_ids"), col("y_pred")))
    info(f"fuzzy retrieval MRR=${r.mrr}%.3f recall@10=${r.recallAtK}%.3f")
    assert(r.mrr >= 0.0 && r.mrr <= 1.0)
    assert(r.recallAtK >= r.mrr - 1e-9)
  }

  test("confusion counts, error listing, per-source evaluation") {
    import spark.implicits._
    val preds = Seq(
      ("Q1", "Q1", "a", "dev"), ("Q1", "Q2", "b", "dev"),
      ("Q2", "Q2", "c", "unlinked"), ("Q3", "Q3", "d", "unlinked"))
      .toDF("y_true", "y_pred", "text", "source")
    val conf = Metrics.confusionCounts(preds).collect()
    assert(conf.length == 4)
    val errs = Metrics.classificationErrors(preds).collect()
    assert(errs.length == 1 && errs.head.getString(0) == "b")
    val bySource = Metrics.evaluateBySource(preds)
    assert(bySource("dev").micF1 == 0.5 && bySource("unlinked").micF1 == 1.0)
    assert(Metrics.labelDistribution(preds, "y_true").head().getLong(1) == 2L)
  }
}
