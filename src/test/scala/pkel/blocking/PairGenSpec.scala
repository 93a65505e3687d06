package pkel.blocking

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.cluster.ConnectedComponents

class PairGenSpec extends SparkSpec {

  import spark.implicits._

  private def mentionsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("mention_id", "blocking_key", "mention")
      .withColumn("tokens", split(col("blocking_key"), " "))

  private def componentsOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    ConnectedComponents.run(spark, pairs.select("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("same-key mentions are always transitively connected, at any salt") {
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) "auc inf" else "cl", s"m$i"))
    val df = mentionsDf(rows)
    Seq(
      PairGen.Config(adaptiveSalt = false, saltBuckets = 1),
      PairGen.Config(adaptiveSalt = false, saltBuckets = 7),
      PairGen.Config(adaptiveSalt = true, targetBucketSize = 5),
      PairGen.Config(adaptiveSalt = true, targetBucketSize = 64)
    ).foreach { cfg =>
      val comps = componentsOf(PairGen.candidatePairs(df, cfg))
      val byKey = rows.groupBy(_._2).values.toSeq
      byKey.foreach { group =>
        val ids = group.map(_._1)
        val roots = ids.map(comps.getOrElse(_, -1L)).distinct
        assert(roots.size == 1, s"cfg=$cfg split key group: $roots")
      }
    }
  }

  test("adaptive salting caps pair production on hot keys") {
    val hot = (1L to 2000L).map(i => (i, "t1/2", s"m$i"))
    val cfgAll = PairGen.Config(adaptiveSalt = false, saltBuckets = 1)
    val cfgSalted = PairGen.Config(adaptiveSalt = true, targetBucketSize = 32)
    val nAll = PairGen.candidatePairs(mentionsDf(hot), cfgAll).count()
    val nSalted = PairGen.candidatePairs(mentionsDf(hot), cfgSalted).count()
    info(s"all-pairs=$nAll salted=$nSalted")
    assert(nAll == 2000L * 1999 / 2)
    assert(nSalted < nAll / 10, "salting must collapse quadratic hot-key pair counts")
    // connectivity preserved
    val comps = componentsOf(PairGen.candidatePairs(mentionsDf(hot), cfgSalted))
    assert(comps.values.toSet.size == 1)
  }

  test("pairs carry correct features for both sides") {
    val df = mentionsDf(Seq((1L, "cl", "CL"), (2L, "cl", "clearance"), (3L, "auc", "AUC")))
    val pairs = PairGen.candidatePairsWithFeatures(df, PairGen.Config(adaptiveSalt = false, saltBuckets = 1))
      .collect()
    val p = pairs.find(r => r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(p.isDefined, s"missing (2,1) pair in ${pairs.mkString(",")}")
    assert(p.get.getString(2) == "cl" && p.get.getString(3) == "cl")
    assert(p.get.getString(4) == "clearance" && p.get.getString(5) == "CL")
  }

  test("LSH oversize-bucket drop is counted, never silent") {
    // 12 DISTINCT blocking keys sharing one token set → identical minhash
    // signatures → every band buckets all 12 reps together; maxBucketSize=5
    // drops those buckets wholesale (the scale guard under test). The
    // all-dropped case is the adversarial one: AQE rewrites the emptied join
    // to EmptyRelation, which is exactly why the counter rides accumulators
    // and not a CollectMetrics node (see PairDropMetrics scaladoc).
    val degenerate = (1L to 12L).map(i =>
      (i, s"auc inf ss pad$i", s"m$i")).toDF("mention_id", "blocking_key", "mention")
      .withColumn("tokens", split(lit("auc inf ss"), " ")) // shared token set
    val cfg = PairGen.Config(maxBucketSize = 5)
    PairDropMetrics.reset(spark)
    val n = PairGen.lshPairs(degenerate, cfg).count()
    val drops = PairDropMetrics.drain(spark)
    info(s"lsh pairs=$n drops=$drops")
    assert(n == 0, "oversized buckets must be dropped wholesale")
    assert(drops.isDefined, "drop counters missing")
    val d = drops.get
    assert(d.droppedBuckets >= 1, s"expected dropped buckets, got $d")
    assert(d.droppedMembers >= 12L, s"expected >= 12 dropped members, got $d")
    assert(d.totalBuckets >= d.droppedBuckets)
    // and a clean run reports zero drops but counts its buckets
    PairDropMetrics.reset(spark)
    PairGen.lshPairs(mentionsDf(Seq((1L, "cl a", "x"), (2L, "cl b", "y"))), cfg).count()
    val clean = PairDropMetrics.drain(spark)
    assert(clean.exists(c => c.droppedBuckets == 0L && c.totalBuckets > 0L),
      s"clean run should count buckets with zero drops: $clean")
  }

  test("LSH connects near-duplicate keys via representatives") {
    // two keys with high token overlap → same band with high probability
    val df = mentionsDf(Seq(
      (1L, "auc inf ss t mrt", "a"), (2L, "auc inf ss t mrt", "b"),
      (3L, "auc inf ss t mrt extra", "c")))
    val pairs = PairGen.lshPairs(df, PairGen.Config())
    // reps are 1 (key1) and 3 (key2); at least one band must bucket them
    val got = pairs.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 1L)), s"expected rep pair (3,1), got $got")
  }
}
