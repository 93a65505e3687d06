package pkel.scoring

import org.apache.spark.sql.functions._
import pkel.SparkSpec
import pkel.blocking.PairGen

/** Pins the kernel-fused bucket scoring path (`scoreCandidates`) to the
  * relational reference path (`scorePairs` over exploded candidate pairs),
  * and the precomputed-vec seam to the in-kernel encoder. */
class PairScorerSpec extends SparkSpec {

  import spark.implicits._

  private def keyedDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("mention_id", "blocking_key", "mention")
      .withColumn("tokens", split(col("blocking_key"), " "))

  private val corpus = keyedDf(
    (1L to 300L).map { i =>
      val key = i % 5 match {
        case 0 => "auc inf"; case 1 => "cl"; case 2 => "auc ss"
        case 3 => "t1/2"; case _ => "vd ss"
      }
      (i, key, s"surface ${key.toUpperCase} $i")
    })

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("src"), col("dst"), (col("score") * 1e6).cast("long").as("score_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("scoreCandidates == scorePairs over candidatePairsWithFeatures (pair set + scores)") {
    val cfg = PairGen.Config(adaptiveSalt = true, targetBucketSize = 16)
    val viaKernel = rowsOf(PairScorer.scoreCandidates(corpus, cfg))
    val viaRows = rowsOf(PairScorer.scorePairs(PairGen.candidatePairsWithFeatures(corpus, cfg)))
    assert(viaKernel == viaRows,
      s"kernel-only: ${(viaKernel -- viaRows).take(5)}; rows-only: ${(viaRows -- viaKernel).take(5)}")
  }

  test("precomputed vec columns produce identical scores to in-kernel encoding") {
    val embedUdf = udf((s: String) => Embedder.default.encode(Option(s).getOrElse("")))
    val withVec = corpus.withColumn("vec", embedUdf(col("mention")))
    val cfg = PairGen.Config(adaptiveSalt = true, targetBucketSize = 16)
    assert(rowsOf(PairScorer.scoreCandidates(withVec, cfg)) ==
      rowsOf(PairScorer.scoreCandidates(corpus, cfg)))
    // and the vec columns are consumed, not leaked into the output
    val out = PairScorer.scoreCandidates(withVec, cfg, carryFeatures = true)
    assert(!out.columns.contains("vec_a") && !out.columns.contains("vec_b"))
    assert(out.columns.contains("mention_a"), "carryFeatures must keep feature columns")
    assert(!PairScorer.scoreCandidates(withVec, cfg).columns.contains("mention_a"),
      "lean output must drop feature columns")
  }

  test("scoreCandidates rows are invariant to shuffle-partition count") {
    val cfg = PairGen.Config(adaptiveSalt = true, targetBucketSize = 16)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = rowsOf(PairScorer.scoreCandidates(corpus.repartition(3), cfg))
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      val b = rowsOf(PairScorer.scoreCandidates(corpus.repartition(11), cfg))
      assert(a == b, "pair set + scores must not depend on physical layout")
      assert(a.nonEmpty)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private def fullRowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
    df.select(col("src"), col("dst"),
      (col("key_sim") * 1e6).cast("long"), (col("jw_sim") * 1e6).cast("long"),
      (col("cos_sim") * 1e6).cast("long"), (col("score") * 1e6).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  test("scoreMentions (one-exchange kernel) == scorePairs over blockingKeyPairs") {
    // the one-exchange kernel replicates the relational salted path by hand
    // (XXH64 pmod salt assignment, TreeMap salt order, min-id reps) — this is
    // the parity pin its docstring promises, over BOTH salt modes
    for (cfg <- Seq(
        PairGen.Config(adaptiveSalt = true, targetBucketSize = 16),
        PairGen.Config(adaptiveSalt = false, saltBuckets = 4))) {
      val viaKernel = fullRowsOf(PairScorer.scoreMentions(corpus, cfg))
      val viaRows = fullRowsOf(PairScorer.scorePairs(PairGen.blockingKeyPairs(corpus, cfg)))
      assert(viaKernel == viaRows,
        s"cfg=$cfg kernel-only: ${(viaKernel -- viaRows).take(5)}; " +
          s"rows-only: ${(viaRows -- viaKernel).take(5)}")
      assert(viaKernel.nonEmpty)
    }
  }

  test("unique-surface corpus (memo-miss regime): vec path scores each mention once") {
    // every surface distinct → the per-pair memo never hits; correctness must
    // hold on both paths regardless
    val unique = keyedDf((1L to 120L).map(i => (i, "cl", s"unique-surface-$i")))
    val embedUdf = udf((s: String) => Embedder.default.encode(Option(s).getOrElse("")))
    val cfg = PairGen.Config(adaptiveSalt = false, saltBuckets = 2)
    val memo = rowsOf(PairScorer.scoreCandidates(unique, cfg))
    val vec = rowsOf(PairScorer.scoreCandidates(
      unique.withColumn("vec", embedUdf(col("mention"))), cfg))
    assert(memo == vec)
    assert(memo.nonEmpty)
  }
}
