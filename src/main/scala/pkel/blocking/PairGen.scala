package pkel.blocking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Candidate-pair generation: salted token-sorted blocking keys + MinHash-LSH
  * band buckets (BASELINE.json north_star).
  *
  * Scale posture:
  * - pair production is the quadratic danger zone; every bucket (blocking-key
  *   salt bucket or LSH band bucket) is bounded by `maxBucketSize` before the
  *   self-join, so one hot key can never produce O(n²) pairs;
  * - hot blocking keys are salted into `saltBuckets` sub-buckets
  *   (`pmod(xxhash64(mention_id), S)`); transitive connectivity across salt
  *   buckets of the same key is preserved by chaining bucket representatives
  *   (min mention per bucket), so the *cluster* result is salt-invariant while
  *   the pair count drops from C(n,2) to ≈ S·C(n/S,2) + (S−1);
  * - both generators emit `(src, dst)` with src > dst; dedup happens once at
  *   the end (the union is tiny relative to the input).
  */
object PairGen {

  final case class Config(
      saltBuckets: Int = 8,
      minhashFunctions: Int = 32,
      lshBands: Int = 8,
      maxBucketSize: Int = 1000)

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

  /** Pairs within capped buckets + representative chain edges.
    * `buckets` columns: bucket_key (string/long), mention_id (long). */
  private def pairsInBuckets(buckets: DataFrame, maxBucketSize: Int): DataFrame = {
    // rank members inside each bucket; cap to bound the self-join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_key").orderBy("mention_id")
    val ranked = buckets
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxBucketSize)
    val a = ranked.select(col("bucket_key"), col("mention_id").as("src"), col("rk").as("rka"))
    val b = ranked.select(col("bucket_key"), col("mention_id").as("dst"), col("rk").as("rkb"))
    a.join(b, Seq("bucket_key"))
      .filter(col("rka") < col("rkb"))
      .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
  }

  /** Blocking-key pairs with salting + representative chaining.
    * Input columns: mention_id (long), blocking_key (string, nonempty). */
  def blockingKeyPairs(mentions: DataFrame, cfg: Config): DataFrame = {
    val salted = mentions
      .filter(col("blocking_key") =!= "")
      .select(col("mention_id"), col("blocking_key"),
        pmod(xxhash64(col("mention_id")), lit(cfg.saltBuckets)).as("salt"))
      .withColumn("bucket_key", concat_ws("#", col("blocking_key"), col("salt")))
    val intra = pairsInBuckets(salted.select("bucket_key", "mention_id"), cfg.maxBucketSize)
    // representative chain: min mention of each (key, salt) bucket, linked
    // pairwise within the key (transitively connects the salt buckets)
    val reps = salted.groupBy("blocking_key", "salt").agg(min("mention_id").as("mention_id"))
      .withColumnRenamed("blocking_key", "bucket_key")
    val chain = pairsInBuckets(reps.select("bucket_key", "mention_id"), cfg.saltBuckets + 1)
    intra.union(chain)
  }

  /** MinHash-LSH pairs over the canonical token sets.
    * Input columns: mention_id (long), tokens (array<string>, nonempty). */
  def lshPairs(mentions: DataFrame, cfg: Config): DataFrame = {
    val banded = mentions
      .filter(size(col("tokens")) > 0)
      .select(col("mention_id"),
        explode(minhashUdf(col("tokens"), lit(cfg.minhashFunctions), lit(cfg.lshBands))).as("band"))
      .withColumn("bucket_key", col("band").cast("string"))
    pairsInBuckets(banded.select("bucket_key", "mention_id"), cfg.maxBucketSize)
  }

  /** Union of both generators, deduplicated. */
  def candidatePairs(mentions: DataFrame, cfg: Config = Config()): DataFrame =
    blockingKeyPairs(mentions, cfg).union(lshPairs(mentions, cfg)).distinct()
}
