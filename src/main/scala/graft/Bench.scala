package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: runs the operator battery + a scored-pairs/sec probe
  * of the EL pipeline, prints ONE JSON line (driver contract). */
object Bench {

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      // FIXED partition count across parallelism levels: partitioning is a
      // data-layout decision, not a cluster-size one — per-partition state
      // (scoring memos) and task granularity stay identical when comparing
      // N vs 4N cores, so the scaling measurement isolates compute
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Materialize the keyed-mention table for `nConvs` conversations to a
    * parquet path (idempotent per (nConvs, seed)) and return the path. */
  def materializeKeyed(spark: SparkSession, nConvs: Long, baseDir: String = "/dev/shm/pkel-bench"): String = {
    val path = s"$baseDir/keyed_v${pkel.transcript.TranscriptSynth.version}_$nConvs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      val entries = pkel.ontology.Ontology.load()
      val transcripts = pkel.transcript.TranscriptSynth.generate(spark, entries, nConvs, seed = 42L)
      val mentions = pkel.app.Pipeline.extractMentions(transcripts)
      pkel.link.ExactLinker.withBlockingKey(mentions)
        .select("mention_id", "blocking_key", "tokens", "mention")
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Scored candidate pairs per second over a pre-materialized keyed table
    * (salted blocking + LSH pair gen + kernel-fused batched scoring, forced
    * via count). */
  def pairThroughputFrom(spark: SparkSession, keyedPath: String): (Long, Double) = {
    val keyed = spark.read.parquet(keyedPath)
    val t0 = System.nanoTime()
    val n = pkel.scoring.PairScorer.scoreCandidates(keyed).count()
    val sec = (System.nanoTime() - t0) / 1e9
    (n, n / sec)
  }

  /** Convenience: synthesize + measure in one go (per-round bench). */
  def pairThroughput(spark: SparkSession, nConvs: Long): (Long, Double) =
    pairThroughputFrom(spark, materializeKeyed(spark, nConvs))

  /** Fixed-cost host-noise sentinel: a deterministic codegen'd aggregate over
    * a constant range, CPU-bound and input-independent, so its wall time
    * varies ONLY with deliverable host capacity. The battery interleaves it
    * between query groups; a degraded window (this VM's deliverable CPU
    * swings 0.45–1.0 by the minute) then shows up as probe variance IN the
    * artifact instead of masquerading as a query regression — BENCH_r04's
    * 3.3× paper regression was exactly such a window. */
  def noiseProbe(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // bit_xor, not sum: full-range xxhash64 values overflow a long sum under
    // ANSI mode (Spark 4 default) after a handful of rows
    spark.range(0, 1600000000L, 1, 64).select(bit_xor(xxhash64(col("id")))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** The driver-contract JSON line (one object, no nesting surprises).
    * Extracted so a spec can pin that it stays machine-parseable — round 1
    * lost its bench metrics to a parse failure. `probes` carries the
    * host-noise sentinel samples taken across the battery (label → sec);
    * `noise_ratio` = max/min probe time, ≈1.0 in a clean window. */
  def jsonLine(queries: Seq[(String, Double)], sfDir: String, nPairs: Long,
      pairsPerSec: Double, cpus: String, failed: Seq[String],
      probes: Seq[(String, Double)] = Nil): String = {
    def esc(x: String): String = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = queries.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val total = queries.map(_._2).sum
    val failedJson = failed.map(f => "\"" + esc(f) + "\"").mkString("[", ",", "]")
    val probeJson =
      if (probes.isEmpty) ""
      else {
        val ps = probes.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
        val ratio = probes.map(_._2).max / math.max(1e-9, probes.map(_._2).min)
        s""","noise_probe_sec":$ps,"noise_ratio":$ratio"""
      }
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${esc(sfDir)}","scored_pairs":$nPairs,"scored_pairs_per_sec":$pairsPerSec,"cpus":"${esc(cpus)}","failed":$failedJson$probeJson}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)
    // never write DuckDB-oracle dumps from the bench: a bench run pointed at
    // the verify sf (0.01) would otherwise charge oracle-only IO to timings
    Queries.setDumpEnabled(false)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    /** Real-path normalization so an alias of the target dir (trailing slash,
      * symlink, relative spelling) cannot slip q_el_* warm-up onto the timed
      * dir and let the per-(session, dir) caches serve the measurement. */
    def realPath(p: String): String =
      try java.nio.file.Paths.get(p).toRealPath().toString
      catch { case _: Exception => java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString }
    // JIT/codegen warm-up before anything is timed: the first cold run of a
    // heavy query measures 3-8x its warm time on this VM. Stateless queries
    // warm on the TARGET sfDir (steady-state measurement: codegen for the
    // actual plans + OS page cache); the q_el_* queries warm at the smallest
    // sf instead, because their per-(session, dir) caches would otherwise
    // serve the timed run from memory and measure nothing.
    val warmDir = "/root/testdata/sf0.001"
    val haveWarmDir = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith("q_el_")) {
        // EL queries may only warm at a DIFFERENT dir — their per-(session,
        // dir) caches would serve the timed run from memory otherwise
        if (haveWarmDir && realPath(warmDir) != realPath(sfDir))
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
      } else
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // drop warm-up residue (persisted q_el_* DataFrames at warmDir, streaming
    // memory-sink tables) so dead storage does not compete with the timed runs
    Queries.releaseCaches(spark)
    // Host-noise sentinel: sample the fixed-cost probe at battery start, after
    // every 10th timed query and at the end, so a degraded host window during
    // any 10-query span is visible in the artifact itself (noise_ratio ≫ 1).
    val probes = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    probes += ("p_start" -> noiseProbe(spark))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => failed += name; System.err.println(s"BENCH FAIL $name: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      if ((i + 1) % 10 == 0) probes += (s"p_q${i + 1}" -> noiseProbe(spark))
      name -> sec
    }
    probes += ("p_battery_end" -> noiseProbe(spark))
    // Scored-pairs/sec probe. Corpus synthesis + parquet materialization stay
    // OUTSIDE the timed window (they are input prep, not the operator), and
    // the corpus is sized so kernel compute amortizes the local-mode job
    // floor (~3 s); best of 2 reps filters host CPU noise.
    // release battery state before the probe too — the probe reads its own
    // pre-materialized parquet and should not share memory with stale caches
    Queries.releaseCaches(spark)
    val probeConvs = math.max(20000L, (10000000L * Queries.sfOf(sfDir)).toLong)
    val keyedPath = materializeKeyed(spark, probeConvs)
    val reps = (1 to 2).map(_ => pairThroughputFrom(spark, keyedPath))
    val nPairs = reps.head._1
    val pairsPerSec = reps.map(_._2).max
    probes += ("p_end" -> noiseProbe(spark))
    val all = results :+ ("el_pair_scoring" -> nPairs / pairsPerSec)
    val json = jsonLine(all, sfDir, nPairs, pairsPerSec, cpus, failed.toSeq, probes.toSeq)
    println(json)
    System.err.println(json)
    // sbt decorates stdout with [info]/[error] prefixes that break the
    // driver's JSON parse — the file copy is the reliable channel.
    val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH/last.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}
