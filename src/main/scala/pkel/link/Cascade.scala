package pkel.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import pkel.blocking.CategoryBlocker
import pkel.features.Features
import pkel.model.OntologyEntry
import pkel.ontology.Ontology

/** The tiered linking cascade: exact → (category blocking) → fuzzy →
  * bi-encoder, each tier consuming the unlinked residue of the previous one
  * (cascade wiring of the reference's `scripts/linking/evaluation` scripts,
  * SURVEY.md §3). Output: one prediction row per mention with
  * (y_pred, tier, status, score).
  */
object Cascade {

  final case class Config(
      fuzzyK: Int = 10,
      fuzzyThreshold: Double = 80.0,
      fuzzyMode: String = "token",
      biencoderK: Int = 5,
      biencoderThreshold: Double = 0.75,
      categoryConstrained: Boolean = true,
      textWindow: Int = 5)

  private val predCols = Seq("mention_id", "label", "blocking_key", "y_pred", "tier", "status", "score")

  /** Run the full cascade over a mention DataFrame (columns: mention_id,
    * text, label, span_start, span_end, is_table, + table context columns).
    * Returns (predictions, enriched) where predictions has one row per
    * mention. */
  def run(spark: SparkSession, mentions: DataFrame, entries: Seq[OntologyEntry],
      cfg: Config = Config()): DataFrame = {
    val index = Ontology.blockingIndex(entries)

    // feature + key derivation (one projection stage)
    val featured = Features.withMentionFeatures(
      ExactLinker.withBlockingKey(mentions), cfg.textWindow)

    // tier 1: exact — emits linked/excluded, residue flows on
    val exact = ExactLinker.link(spark, featured, index)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactEmitted = exact.filter(col("status").isin(
      ExactLinker.StatusLinked, ExactLinker.StatusDisambiguated,
      ExactLinker.StatusTableDefault, ExactLinker.StatusExcluded))
      .withColumn("score", lit(100.0))
    val residue1 = exact.filter(col("status").isin(
      ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))

    // stage 2: category blocking on the residue
    val subsetted = CategoryBlocker.withSubsets(residue1, entries)

    // tier 2: fuzzy token scoring, category-constrained
    val fuzzy = FuzzyLinker.link(spark, subsetted.drop("y_pred", "status", "tier"),
      index, cfg.fuzzyK, cfg.fuzzyThreshold, cfg.fuzzyMode, cfg.categoryConstrained)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fuzzyLinked = fuzzy.filter(col("status") === "linked")
    val residue2 = fuzzy.filter(col("status") === "unlinked")
      .drop("pred_ids", "pred_scores", "y_pred", "status", "tier", "score")

    // tier 3: bi-encoder retrieval on the remaining residue
    val bienc = BiencoderLinker.link(spark, residue2, entries,
      featureCol = "retrieval_feature", cfg.biencoderK, cfg.biencoderThreshold,
      cfg.categoryConstrained)

    exactEmitted.select(predCols.map(col): _*)
      .unionByName(fuzzyLinked.select(predCols.map(col): _*))
      .unionByName(bienc.select(predCols.map(col): _*))
  }
}
