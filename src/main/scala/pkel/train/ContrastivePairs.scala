package pkel.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import pkel.model.OntologyEntry
import pkel.ontology.Ontology

/** Contrastive training-pair generation for the bi-encoder trainer —
  * behavioral port of
  * `/root/reference/pk_el/linkers/biencoder_linker.py:12-70`:
  *
  *  - NIL-labeled mentions are skipped (`:41-43`);
  *  - one positive per mention: (mention, gold entity text, 1.0) (`:45`);
  *  - up to `numHardNegs` HARD negatives sampled from the gold entity's own
  *    category minus the gold (`:49-54`) — the same-block negatives that make
  *    the encoder separate near-identical parameters;
  *  - up to `numRandomNegs` random negatives from the full ontology minus
  *    the gold (`:56-61`).
  *
  * The entity text is the ontology embedding feature (the trainer passes
  * `id_to_label_embeds` from `prepare_ontology_for_embedding`,
  * `scripts/linking/tuning/train_biencoder.py:51,106-124`).
  *
  * Spark restatement: the ontology is a broadcast dimension; negatives come
  * from broadcast joins (mention × same-category entries / × full ontology)
  * ranked per mention by a seeded hash and cut at k with a window — sampling
  * is deterministic PER MENTION (not RNG-call-order-dependent like
  * `random.sample`), so output is partitioning- and parallelism-invariant.
  */
object ContrastivePairs {

  final case class Config(
      includeHardNegatives: Boolean = true,
      numHardNegs: Int = 1,
      includeRandomNegatives: Boolean = true,
      numRandomNegs: Int = 1,
      nilLabel: String = "Q100",
      seed: Long = 42L)

  /** Ontology dimension rows for the joins. */
  def ontologyDim(spark: SparkSession, entries: Seq[OntologyEntry]): DataFrame = {
    import spark.implicits._
    entries.map(e => (e.parameterId, e.categoryId, Ontology.embeddingFeature(e)))
      .toDF("parameter_id", "category_id", "entity_text")
  }

  /** Generate (mention_id, query, response, label) training pairs.
    * Input columns: `mention_id`, `mentionCol` (the query text), `labelCol`
    * (gold parameter id). Mentions whose gold id is absent from the ontology
    * are dropped (the reference would KeyError on them). */
  def generate(spark: SparkSession, mentions: DataFrame, entries: Seq[OntologyEntry],
      cfg: Config = Config(), mentionCol: String = "mention",
      labelCol: String = "label"): DataFrame = {
    val dim = ontologyDim(spark, entries)
    val nonNil = mentions
      .filter(lower(trim(col(labelCol))) =!= cfg.nilLabel.toLowerCase)
      .select(col("mention_id"), col(mentionCol).as("query"), col(labelCol).as("gold"))

    // positive: gold entity text (inner join drops out-of-ontology golds)
    val gold = dim.select(col("parameter_id").as("gold"),
      col("category_id").as("gold_cat"), col("entity_text").as("gold_text"))
    val withGold = nonNil.join(broadcast(gold), "gold")
    val positives = withGold.select(col("mention_id"), col("query"),
      col("gold_text").as("response"), lit(1.0).as("label"))

    def negatives(candidates: DataFrame, k: Int, tag: String): DataFrame = {
      val withHash = candidates.withColumn("pick_hash",
        xxhash64(lit(cfg.seed), lit(tag), col("mention_id"), col("parameter_id")))
      if (k == 1)
        // k = 1 (the default): the seeded pick is an argmin over
        // (pick_hash, parameter_id), so a map-side-combinable min_by
        // aggregate replaces the window — the mention × candidate fan-out is
        // reduced to one row per mention BEFORE the exchange instead of the
        // whole fan-out being shuffled and sorted (guide §2.3 "aggregate
        // before you shuffle"). Ordering semantics are identical to
        // row_number over (pick_hash, parameter_id): struct comparison is
        // lexicographic field order.
        withHash.groupBy(col("mention_id"))
          .agg(min_by(struct(col("query"), col("entity_text")),
            struct(col("pick_hash"), col("parameter_id"))).as("m"))
          .select(col("mention_id"), col("m.query").as("query"),
            col("m.entity_text").as("response"), lit(0.0).as("label"))
      else {
        val w = Window.partitionBy("mention_id")
          .orderBy(col("pick_hash"), col("parameter_id"))
        withHash
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .select(col("mention_id"), col("query"),
            col("entity_text").as("response"), lit(0.0).as("label"))
      }
    }

    val hard =
      if (cfg.includeHardNegatives && cfg.numHardNegs > 0)
        Some(negatives(
          withGold.join(broadcast(dim), col("category_id") === col("gold_cat") &&
            col("parameter_id") =!= col("gold")),
          cfg.numHardNegs, "hard"))
      else None

    val random =
      if (cfg.includeRandomNegatives && cfg.numRandomNegs > 0)
        Some(negatives(
          withGold.join(broadcast(dim), col("parameter_id") =!= col("gold")),
          cfg.numRandomNegs, "random"))
      else None

    (Seq(positives) ++ hard ++ random).reduce(_ unionByName _)
  }
}
