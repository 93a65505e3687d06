package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Listener-grade AQE skew-join evidence at bench scale (round-4 verdict
  * item 6). Two phases over ONE hostile corpus (10% hot blocking key +
  * Zipf(1) tail, `SkewBench.skewedMentions`), sized so the engine-path run
  * scores ≥ 10^9 pairs:
  *
  *   1. The edge build itself — salted candidate generation + kernel-fused
  *      scoring + threshold — which handles the hot key by SALTING (AQE never
  *      needs to see a skewed partition; this is the designed path).
  *   2. The same corpus pushed through the engine's one genuinely
  *      skew-exposed join shape — the exact-tier mention ⋈ per-key-dim join
  *      (`ExactLinker.link`'s blocking-index join) with broadcast disabled,
  *      the regime a 100-TB ontology forces — where AQE's skew-join machinery
  *      IS the mitigation. The executed plan is walked for
  *      `AQEShuffleReadExec` nodes and their `PartialReducerPartitionSpec`
  *      splits, so the skew handling is verified from the runtime plan
  *      object, not eyeballed from logs.
  *
  * Appends its section to BENCH/SKEW.md (SkewBench owns the file's head).
  *
  * Usage: runMain graft.AqeSkewBench [nMentions=33000000] [outPath=BENCH/SKEW.md]
  */
object AqeSkewBench {

  /** (skewedPartitions, totalSplitSpecs, planHasSkewFlag) from the final
    * adaptive plan of an executed DataFrame. */
  def skewSplitStats(df: DataFrame): (Int, Int, Boolean) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    val plan = df.queryExecution.executedPlan
    // QueryStageExec nodes are LEAVES of the adaptive tree — their materialized
    // sub-plans (where the skew-handled join actually lives) are only reachable
    // by recursing through each stage's `plan` field
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case q: QueryStageExec => q +: allNodes(q.plan)
        case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
        case n => Seq(n)
      }
    val reads = allNodes(plan).collect { case r: AQEShuffleReadExec => r }
    val skewedReads = reads.filter(_.hasSkewedPartition)
    val splits = reads.map(_.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])).sum
    val flag = plan.toString.split("== Initial Plan ==").head.contains("skew=true")
    (skewedReads.size, splits, flag)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(33000000L)
    val outPath = args.lift(1).getOrElse("BENCH/SKEW.md")
    // debug escape hatch: phase 2 only, no artifact write (plan iteration)
    val phase2Only = args.lift(2).contains("phase2")
    val spark = Bench.session("32")

    // ---- phase 1: the >=1B-pair edge build on the hostile corpus ----------
    val path = s"/dev/shm/pkel-skew/aqe_v${SkewBench.generatorVersion}_$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
      SkewBench.skewedMentions(spark, n).write.mode("overwrite").parquet(path)
    val mentions = spark.read.parquet(path)
    val (pairs, edges, edgeSec) = if (phase2Only) (0L, 0L, 0.0) else {
      val t0 = System.nanoTime()
      val edgeRow = pkel.scoring.PairScorer.scoreCandidates(mentions)
        .agg(count(lit(1)).as("pairs"),
          sum(when(col("score") >= 0.9, 1L).otherwise(0L)).as("edges")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      (edgeRow.getLong(0), edgeRow.getLong(1), sec)
    }
    if (!phase2Only)
      System.err.println(f"[aqe-skew] edge build: $pairs%,d pairs -> $edges%,d edges " +
        f"in $edgeSec%.1f s (${pairs / edgeSec / 1e6}%.1fM pairs/s)")

    // ---- phase 2: the unsalted skew-exposed join, AQE as the mitigation ---
    // The hot reduce partition must be big in COMPRESSED shuffle bytes for
    // skew detection, so each row carries an incompressible md5 payload (the
    // stand-in for real mention text + features at this width). Thresholds
    // are sized to this corpus (~3.3M-row hot key): detection at 64 MB,
    // 16 MB split advisory — the same ratios the defaults (256 MB/64 MB)
    // give a 4x larger corpus. 256 reduce partitions matches the production
    // regime the probe models (hot partition ≫ median): at this repo's bench
    // default of 32, the ~1M tail rows co-hashing into EVERY partition leave
    // the hot one only ~4x the median — under the stock skewedPartitionFactor
    // of 5, which we deliberately keep stock so detection itself is default
    // Spark behavior, not a tuned demo.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "256",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> s"${64L * 1024 * 1024}",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> s"${16L * 1024 * 1024}")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val left = mentions.select(col("blocking_key"), md5(col("mention_id").cast("string")).as("payload"))
    // the dim is MATERIALIZED first (as the exact tier's blocking index is in
    // production) — also required for OptimizeSkewedJoin to act at all: its
    // pattern is SMJ(sort(shuffle), sort(shuffle)), and an aggregate sitting
    // between the right sort and its shuffle stage defeats the rule
    val dimPath = s"$path-dim"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dimPath/_SUCCESS")))
      mentions.groupBy("blocking_key").agg(count(lit(1)).as("key_n"))
        .write.mode("overwrite").parquet(dimPath)
    val keyDim = spark.read.parquet(dimPath)
    val t1 = System.nanoTime()
    val joined = left.join(keyDim, "blocking_key")
      .agg(count(lit(1)).as("rows"), sum(length(col("payload"))).as("bytes"),
        sum(col("key_n")).as("wsum"))
    // collect(), not head(): head() runs a separate limit(1) QueryExecution,
    // leaving `joined.queryExecution`'s adaptive plan unexecuted — the stats
    // walk below must read the SAME execution that did the work
    val jr = joined.collect().head
    val joinSec = (System.nanoTime() - t1) / 1e9
    val (skewedReads, splits, flagged) = skewSplitStats(joined)
    System.err.println(s"[aqe-skew] join: ${jr.getLong(0)} rows in " +
      f"$joinSec%.1f s; skewed AQE reads=$skewedReads, partial-reducer splits=$splits, skew=true flag=$flagged")
    if (phase2Only) {
      System.err.println("[aqe-skew] final plan:\n" +
        joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
      spark.stop(); return
    }
    spark.stop()

    require(jr.getLong(0) == n, s"join lost rows: ${jr.getLong(0)} of $n")
    require(flagged && skewedReads > 0 && splits > 1,
      s"AQE did not split the hot partition (reads=$skewedReads splits=$splits flag=$flagged)")

    val section =
      f"""
         |## AQE skew-join splitting at bench scale (plan-verified)
         |
         |Corpus: the same hostile distribution at $n%,d mentions (hot key =
         |10%% of all rows). Phase 1 — the engine's own edge build — scored
         |$pairs%,d pairs → $edges%,d edges ≥ 0.9 in $edgeSec%.1f s
         |(${pairs / edgeSec / 1e6}%.1fM pairs/s): salting pre-balances the
         |quadratic stage, so AQE correctly sees no skew there.
         |
         |Phase 2 — the one engine join a 100-TB deployment cannot salt or
         |broadcast (exact-tier mention ⋈ MATERIALIZED blocking-index dim at
         |full ontology width; broadcast disabled, incompressible per-row
         |payload, 256 reduce partitions so hot ≫ median as at production
         |width) on the identical corpus: AQE's runtime skew handling split
         |the hot partition under the STOCK skew factor. Verified by walking
         |the FINAL `AdaptiveSparkPlanExec` plan object recursively through
         |its `QueryStageExec` leaves (not log text): **$skewedReads
         |AQEShuffleRead node(s) with `hasSkewedPartition`, $splits
         |`PartialReducerPartitionSpec` splits**, `skew=true` on the
         |sort-merge join; ${jr.getLong(0)}%,d rows joined in $joinSec%.1f s.
         |Detection threshold 64 MB / advisory 16 MB — the defaults' ratios
         |scaled to this corpus's ~115 MB hot partition. Two shapes that
         |DEFEAT the rule, found while building this probe and worth knowing
         |at scale: an aggregate between the join's sort and its shuffle
         |stage (pattern mismatch → only coalescing fires), and reading the
         |result via `head()` (a separate limit QueryExecution, so the
         |inspected plan never executed).
         |""".stripMargin
    val p = java.nio.file.Paths.get(outPath)
    val prior = if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else ""
    val head = prior.indexOf("\n## AQE skew-join") match {
      case -1 => prior
      case i => prior.take(i)
    }
    java.nio.file.Files.writeString(p, head + section)
    println(section)
  }
}
