package pkel.blocking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Candidate-pair generation: salted token-sorted blocking keys + MinHash-LSH
  * band buckets (BASELINE.json north_star).
  *
  * Scale posture:
  * - pair production is the quadratic danger zone; hot blocking keys are
  *   salted ADAPTIVELY — salt factor ∝ key frequency — so every bucket holds
  *   ≈ `targetBucketSize` members and per-key pair cost is O(n·target), not
  *   O(n²); a lag-chain over bucket representatives keeps each key's mentions
  *   transitively connected, so clusters are salt-invariant;
  * - pairs are emitted WITH both sides' scoring features (blocking key + raw
  *   mention), carried through the bucket self-join: the expensive shuffle
  *   moves O(mentions) bucket rows, never O(pairs) rows, and the scoring
  *   kernel runs pipelined in the same stage as the join output;
  * - MinHash-LSH runs over *distinct* blocking keys (one representative
  *   mention per key): all mentions of a key share one token set, so banding
  *   them individually would replicate every hot key's block once per band.
  *   Degenerate (oversized) LSH buckets are dropped wholesale;
  * - duplicate pairs across generators are tolerated downstream (CC dedupes
  *   edges; scoring is idempotent) — no global distinct shuffle.
  */
object PairGen {

  final case class Config(
      saltBuckets: Int = 8,          // fixed-salt mode (tests)
      minhashFunctions: Int = 32,
      lshBands: Int = 8,
      maxBucketSize: Int = 1000,
      targetBucketSize: Int = 64,    // adaptive mode: aim C(target,2) pairs/bucket
      maxSaltFactor: Int = 4096,
      adaptiveSalt: Boolean = true)

  /** MinHash signature of a token set: k seeded min-hashes. */
  def minhash(tokens: Seq[String], k: Int): Array[Int] = {
    val sig = Array.fill(k)(Int.MaxValue)
    tokens.foreach { t =>
      var i = 0
      while (i < k) {
        val h = MurmurHash3.stringHash(t, 0x2545F491 + i * 0x9E3779B9)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** LSH band hashes of a signature: `bands` values, each hashing k/bands rows. */
  def bandHashes(sig: Array[Int], bands: Int): Array[Long] = {
    val rows = math.max(1, sig.length / bands)
    Array.tabulate(bands) { b =>
      var h = 1125899906842597L
      var i = b * rows
      val end = math.min(sig.length, (b + 1) * rows)
      while (i < end) { h = 31 * h + sig(i); i += 1 }
      (b.toLong << 56) ^ (h & 0x00FFFFFFFFFFFFFFL)
    }
  }

  private val minhashUdf = udf((tokens: Seq[String], k: Int, bands: Int) =>
    bandHashes(minhash(Option(tokens).getOrElse(Seq.empty), k), bands))

  private val pairCols = Seq("src", "dst", "key_a", "key_b", "mention_a", "mention_b")

  /** All (src>dst) pairs within each bucket via a bucket-key self-join,
    * features carried through. `buckets` columns: bucket_key, mention_id,
    * blocking_key, mention. When `dropOversized`, buckets larger than
    * `maxBucketSize` are skipped wholesale (degenerate LSH bands). */
  private def pairsInBuckets(buckets: DataFrame, maxBucketSize: Int,
      dropOversized: Boolean = false): DataFrame = {
    val bounded =
      if (!dropOversized) buckets
      else {
        val counts = buckets.groupBy("bucket_key").agg(count(lit(1)).as("bucket_n"))
        buckets.join(counts.filter(col("bucket_n") <= maxBucketSize), "bucket_key")
      }
    val a = bounded.select(col("bucket_key"), col("mention_id").as("src"),
      col("blocking_key").as("key_a"), col("mention").as("mention_a"))
    val b = bounded.select(col("bucket_key"), col("mention_id").as("dst"),
      col("blocking_key").as("key_b"), col("mention").as("mention_b"))
    a.join(b, Seq("bucket_key"))
      .filter(col("src") > col("dst"))
      .select(pairCols.map(col): _*)
  }

  /** Blocking-key pairs with (adaptively) salted buckets + representative
    * lag-chain. Input columns: mention_id, blocking_key, mention. */
  def blockingKeyPairs(mentions: DataFrame, cfg: Config): DataFrame = {
    val keyedMentions = mentions.filter(col("blocking_key") =!= "")
    val withSalt =
      if (cfg.adaptiveSalt) {
        val counts = keyedMentions.groupBy("blocking_key")
          .agg(count(lit(1)).as("key_n"))
          .withColumn("salt_n",
            least(greatest(ceil(col("key_n") / cfg.targetBucketSize), lit(1)), lit(cfg.maxSaltFactor))
              .cast("int"))
          .select("blocking_key", "salt_n")
        keyedMentions.join(counts, "blocking_key")
      } else keyedMentions.withColumn("salt_n", lit(cfg.saltBuckets))
    val salted = withSalt
      .withColumn("salt", pmod(xxhash64(col("mention_id")), col("salt_n")))
      .withColumn("bucket_key", concat_ws("#", col("blocking_key"), col("salt")))
    val intra = pairsInBuckets(
      salted.select("bucket_key", "mention_id", "blocking_key", "mention"), cfg.maxBucketSize)
    // representative lag-chain across salt buckets (same key both sides)
    val wChain = org.apache.spark.sql.expressions.Window
      .partitionBy("blocking_key").orderBy("salt")
    val reps = salted.groupBy("blocking_key", "salt")
      .agg(min("mention_id").as("rep"), first("mention").as("rep_mention"))
    val chain = reps
      .withColumn("prev_rep", lag("rep", 1).over(wChain))
      .withColumn("prev_mention", lag("rep_mention", 1).over(wChain))
      .filter(col("prev_rep").isNotNull)
      .select(
        greatest(col("rep"), col("prev_rep")).as("src"),
        least(col("rep"), col("prev_rep")).as("dst"),
        col("blocking_key").as("key_a"), col("blocking_key").as("key_b"),
        when(col("rep") > col("prev_rep"), col("rep_mention")).otherwise(col("prev_mention")).as("mention_a"),
        when(col("rep") > col("prev_rep"), col("prev_mention")).otherwise(col("rep_mention")).as("mention_b"))
    intra.unionByName(chain)
  }

  /** MinHash-LSH pairs over *distinct* canonical token sets (one
    * representative mention per blocking key).
    * Input columns: mention_id, blocking_key, tokens, mention. */
  def lshPairs(mentions: DataFrame, cfg: Config): DataFrame = {
    val keyReps = mentions
      .filter(size(col("tokens")) > 0)
      .groupBy("blocking_key")
      .agg(min("mention_id").as("mention_id"), first("tokens").as("tokens"),
        first("mention").as("mention"))
    val banded = keyReps
      .select(col("mention_id"), col("blocking_key"), col("mention"),
        explode(minhashUdf(col("tokens"), lit(cfg.minhashFunctions), lit(cfg.lshBands))).as("band"))
      .withColumn("bucket_key", col("band").cast("string"))
    pairsInBuckets(
      banded.select("bucket_key", "mention_id", "blocking_key", "mention"),
      cfg.maxBucketSize, dropOversized = true)
      .distinct() // same key pair recurs across bands; rep set is small
  }

  /** Union of both generators, WITH scoring features on every pair.
    * Columns: src, dst, key_a, key_b, mention_a, mention_b. */
  def candidatePairsWithFeatures(mentions: DataFrame, cfg: Config = Config()): DataFrame =
    blockingKeyPairs(mentions, cfg).unionByName(lshPairs(mentions, cfg))

  /** Bare (src, dst) pair ids. */
  def candidatePairs(mentions: DataFrame, cfg: Config = Config()): DataFrame =
    candidatePairsWithFeatures(mentions, cfg).select("src", "dst")
}
