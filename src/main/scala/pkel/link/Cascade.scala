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
      /** Graft extension (diverges from the reference, which defaults
        * subset-unmatched mentions to NIL): when category blocking finds no
        * subset, retrieval runs unconstrained instead of being forced empty —
        * necessary for typo'd surfaces whose mangled tokens match no category
        * regex. */
      unconstrainedFallback: Boolean = true,
      /** Raw-surface fuzzy threshold (graft extension tier). */
      surfaceThreshold: Double = 90.0,
      textWindow: Int = 5,
      /** Optional tier 5: prompt/LLM linker over the bi-encoder's unlinked
        * residue (reference wiring: `evaluate_prompt_linker.py`). None = the
        * residue stays NIL, as in rounds without an external model. */
      promptScorer: Option[PromptLinker.PromptScorer] = None,
      /** Observability seam: called once per tier with (tierName, fullTierOutput)
        * before residue filtering — the battery uses it to dump tier outputs so
        * the DuckDB oracle can re-derive the first-terminal-tier-wins union
        * independently; a cluster deployment would point it at lineage tables. */
      tierSink: Option[(String, DataFrame) => Unit] = None)

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

    def sink(tier: String, df: DataFrame): Unit = cfg.tierSink.foreach(_(tier, df))

    // tier 1: exact — emits linked/excluded, residue flows on. The
    // full-width tier output (turn text, tagged text, table context, debug
    // candidates) goes to the observability sink only; the cascade's own
    // flow persists just the columns tiers 2–5 and the final union consume
    // (ids/labels/keys/statuses + mention, tokens, retrieval_feature) — the
    // fat text columns would otherwise dominate the cache footprint at
    // tens of millions of mentions.
    val exactFull = ExactLinker.link(spark, featured, index)
    sink("exact", exactFull)
    val exact = exactFull.select(
      (predCols.filterNot(_ == "score") ++ Seq("mention", "tokens", "retrieval_feature"))
        .map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactEmitted = exact.filter(col("status").isin(
      ExactLinker.StatusLinked, ExactLinker.StatusDisambiguated,
      ExactLinker.StatusTableDefault, ExactLinker.StatusExcluded))
      .withColumn("score", lit(100.0))
    val residue1 = exact.filter(col("status").isin(
      ExactLinker.StatusAmbiguous, ExactLinker.StatusUnlinked))

    // stage 2: category blocking on the residue
    val subsetted0 = CategoryBlocker.withSubsets(residue1, entries)
    val subsetted =
      if (cfg.unconstrainedFallback)
        subsetted0.withColumn("subsetted_concepts",
          when(col("subset_matched"), col("subsetted_concepts")))
      else subsetted0

    // tier 2: fuzzy token scoring, category-constrained
    val fuzzy = FuzzyLinker.link(spark, subsetted.drop("y_pred", "status", "tier"),
      index, cfg.fuzzyK, cfg.fuzzyThreshold, cfg.fuzzyMode, cfg.categoryConstrained)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sink("fuzzy", fuzzy)
    val fuzzyLinked = fuzzy.filter(col("status") === "linked")
    val residue2 = fuzzy.filter(col("status") === "unlinked")
      .drop("pred_ids", "pred_scores", "y_pred", "status", "tier", "score")

    // tier 3 (graft extension): typo-tolerant raw-surface fuzzy pass
    val surface = FuzzyLinker.linkRawSurface(spark, residue2,
      Ontology.surfaceIndex(entries), cfg.surfaceThreshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sink("surface", surface)
    val surfaceLinked = surface.filter(col("status") === "linked")
    val residue3 = surface.filter(col("status") === "unlinked")
      .drop("y_pred", "status", "tier", "score")

    // tier 4: bi-encoder retrieval on the remaining residue
    val bienc = BiencoderLinker.link(spark, residue3, entries,
      featureCol = "retrieval_feature", cfg.biencoderK, cfg.biencoderThreshold,
      cfg.categoryConstrained)

    // tier 5 (optional): prompt/LLM linker over the bi-encoder's unlinked
    // residue; the tier merge mirrors merge_llm_and_unmatched_results —
    // linked bi-encoder rows pass through, the NIL residue is re-asked.
    val tier4And5 = cfg.promptScorer match {
      case Some(scorer) =>
        val biencPersisted = bienc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sink("bienc", biencPersisted)
        val biencLinked = biencPersisted.filter(col("status") === "linked")
        val residue4 = biencPersisted.filter(col("status") === "unlinked")
          .drop("pred_ids", "pred_scores", "y_pred", "status", "tier", "score")
        // persist before the eager sink write: without it the sink action
        // evaluates the prompt tier once and the final union recomputes it
        // from scratch (and a non-deterministic scorer could diverge between
        // the dumped tier and the returned union)
        val prompted = if (cfg.tierSink.isDefined)
          PromptLinker.link(spark, residue4, entries, scorer)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else PromptLinker.link(spark, residue4, entries, scorer)
        sink("prompt", prompted)
        biencLinked.select(predCols.map(col): _*)
          .unionByName(prompted.select(predCols.map(col): _*))
      case None =>
        // persist before an eager sink write so the final union reuses the
        // tier output instead of recomputing it
        val b = if (cfg.tierSink.isDefined)
          bienc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else bienc
        sink("bienc", b)
        b.select(predCols.map(col): _*)
    }

    exactEmitted.select(predCols.map(col): _*)
      .unionByName(fuzzyLinked.select(predCols.map(col): _*))
      .unionByName(surfaceLinked.select(predCols.map(col): _*))
      .unionByName(tier4And5)
  }
}
