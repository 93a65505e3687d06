package pkel.train

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.ontology.Ontology

/** Pins the contrastive-pair generator to the reference semantics
  * (`biencoder_linker.py:12-70`): pair counts per mention, same-category
  * hard negatives, gold never sampled as negative, NIL skipped, seeded
  * determinism. */
class ContrastivePairsSpec extends SparkSpec {

  import spark.implicits._

  lazy val entries = Ontology.load()
  lazy val byId = entries.map(e => e.parameterId -> e).toMap
  lazy val catSize = entries.groupBy(_.categoryId).view.mapValues(_.size).toMap

  private def mentionsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("mention_id", "mention", "label")

  test("per-mention pair counts match the reference formula") {
    val gold = entries(3)
    val df = mentionsDf(Seq((1L, "some mention", gold.parameterId)))
    val cfg = ContrastivePairs.Config(numHardNegs = 2, numRandomNegs = 3)
    val out = ContrastivePairs.generate(spark, df, entries, cfg).collect()
    val expHard = math.min(catSize(gold.categoryId) - 1, 2)
    val expRandom = math.min(entries.size - 1, 3)
    assert(out.count(_.getDouble(3) == 1.0) == 1)
    assert(out.count(_.getDouble(3) == 0.0) == expHard + expRandom,
      s"expected $expHard hard + $expRandom random negatives, got ${out.length - 1}")
  }

  test("positives carry the gold embedding feature; negatives never the gold") {
    val gold = entries(10)
    val goldText = Ontology.embeddingFeature(gold)
    val df = mentionsDf(Seq((1L, "m", gold.parameterId)))
    val out = ContrastivePairs.generate(spark, df, entries).collect()
    val pos = out.filter(_.getDouble(3) == 1.0)
    assert(pos.length == 1 && pos.head.getString(2) == goldText)
    assert(out.filter(_.getDouble(3) == 0.0).forall(_.getString(2) != goldText))
  }

  test("hard negatives come from the gold's own category") {
    val gold = entries.find(e => catSize(e.categoryId) >= 3).get
    val df = mentionsDf(Seq((1L, "m", gold.parameterId)))
    val cfg = ContrastivePairs.Config(numHardNegs = 2, includeRandomNegatives = false)
    val negs = ContrastivePairs.generate(spark, df, entries, cfg)
      .filter(col("label") === 0.0).collect().map(_.getString(2))
    val sameCatTexts = entries.filter(e =>
      e.categoryId == gold.categoryId && e.parameterId != gold.parameterId)
      .map(e => Ontology.embeddingFeature(e)).toSet
    assert(negs.nonEmpty && negs.forall(sameCatTexts.contains),
      s"hard negatives outside gold category: ${negs.mkString("; ")}")
  }

  test("NIL mentions are skipped, out-of-ontology golds dropped") {
    val df = mentionsDf(Seq(
      (1L, "nil mention", "Q100"),
      (2L, "stray", "Q99999"),
      (3L, "ok", entries.head.parameterId)))
    val out = ContrastivePairs.generate(spark, df, entries).collect()
    assert(out.forall(_.getLong(0) == 3L))
  }

  test("seeded sampling is deterministic; different seed resamples") {
    val golds = entries.filter(e => catSize(e.categoryId) >= 5).take(10)
    val df = mentionsDf(golds.zipWithIndex.map { case (e, i) => (i.toLong, s"m$i", e.parameterId) })
    def run(seed: Long) = ContrastivePairs.generate(spark, df, entries,
      ContrastivePairs.Config(seed = seed)).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSet
    val a = run(42L); val b = run(42L); val c = run(43L)
    assert(a == b, "same seed must reproduce identical pairs")
    assert(a != c, "different seed should draw a different negative sample")
  }
}
