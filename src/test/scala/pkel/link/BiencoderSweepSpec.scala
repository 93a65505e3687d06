package pkel.link

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.blocking.CategoryBlocker
import pkel.io.MentionReader
import pkel.ontology.Ontology

/** Mirrors the reference's bi-encoder threshold tuning sweep
  * (`scripts/linking/tuning/tune_biencoder_linker.py:36`: thresholds
  * {0.5…0.9} over the exact-tier residue, best micro-F1 wins) — the
  * bi-encoder twin of FuzzySweepSpec, closing the round-2 "threshold is only
  * a Config knob" gap. */
class BiencoderSweepSpec extends SparkSpec {

  lazy val entries = Ontology.load()
  lazy val index = Ontology.blockingIndex(entries)

  private lazy val residue = {
    val mentions = MentionReader.readJsonl(
      spark, resourcePath("/pkel/data/sentences/test.jsonl"), isTable = false)
    val keyed = ExactLinker.withBlockingKey(mentions)
    val exact = ExactLinker.link(spark, keyed, index)
    CategoryBlocker.withSubsets(
      exact.filter(col("status").isin(ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))
        .drop("y_pred", "status", "tier"), entries)
      .cache()
  }

  test("threshold sweep: residue grows monotonically, linked shrinks, counts conserve") {
    val points = BiencoderLinker.sweep(spark, residue, entries, featureCol = "mention")
    val total = residue.count()
    points.foreach(p => info(f"thr=${p.threshold}%.2f linked=${p.linked} residue=${p.residue} micro-F1=${p.microF1}%.3f"))
    points.foreach(p => assert(p.linked + p.residue == total, "every mention gets exactly one outcome"))
    points.sliding(2).foreach { case Seq(a, b) =>
      assert(b.residue >= a.residue,
        s"residue shrank from thr=${a.threshold} (${a.residue}) to thr=${b.threshold} (${b.residue})")
      assert(b.linked <= a.linked)
    }
    // the sweep must actually discriminate somewhere in 0.5-0.9 (a flat
    // sweep would mean the threshold knob is dead)
    assert(points.last.residue > points.head.residue,
      "thresholds 0.5 vs 0.9 produced identical residue — dead knob")
  }

  test("one-pass relational sweep (driver-query recipe) matches the per-threshold kernel") {
    val thresholds = Seq(0.5, 0.6, 0.75, 0.9)
    val kernel = BiencoderLinker.sweep(spark, residue, entries, "mention", thresholds)
    // one kernel pass at the loosest threshold, then score-only head filtering
    // per threshold — the q_el_biencoder_sweep construction
    val loose = BiencoderLinker.link(spark, residue, entries, "mention",
      k = 5, matchThreshold = -1.0)
      .select(col("mention_id"), col("label"), col("pred_ids"), col("pred_scores")).cache()
    val n = loose.count()
    thresholds.zip(kernel).foreach { case (t, kp) =>
      val derived = loose.withColumn("pred", when(
        element_at(col("pred_scores"), 1) >= t &&
          element_at(col("pred_ids"), 1) =!= "Q100",
        element_at(col("pred_ids"), 1)).otherwise(lit("Q100")))
      val linked = derived.filter(col("pred") =!= "Q100").count()
      assert(linked == kp.linked, s"thr=$t linked: $linked != ${kp.linked}")
      assert(n - linked == kp.residue, s"thr=$t residue")
      val correct = derived.filter(col("pred") === col("label")).count()
      assert(math.abs(correct.toDouble / n - kp.microF1) < 1e-12, s"thr=$t micro-F1")
    }
    loose.unpersist(blocking = false)
  }

  test("best-threshold selection is deterministic: max F1, ties to the lower threshold") {
    val points = Seq(
      BiencoderLinker.SweepPoint(0.5, 10, 2, 0.80),
      BiencoderLinker.SweepPoint(0.6, 9, 3, 0.85),
      BiencoderLinker.SweepPoint(0.7, 8, 4, 0.85),
      BiencoderLinker.SweepPoint(0.9, 2, 10, 0.60))
    assert(BiencoderLinker.bestThreshold(points).threshold == 0.6)
    // and on the real sweep: the pick is one of the swept points with max F1
    val real = BiencoderLinker.sweep(spark, residue, entries, featureCol = "mention",
      thresholds = Seq(0.5, 0.7, 0.9))
    val best = BiencoderLinker.bestThreshold(real)
    assert(real.forall(_.microF1 <= best.microF1))
  }
}
