package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memo-miss regime evidence (round-4 verdict item 4): the scoring kernel's
  * per-partition memos assume repetitive surfaces; this main measures the
  * kernel in the OPPOSITE regime — ~100% unique surfaces, every memo lookup a
  * miss — comparing the memo path (kernel encodes from the raw surface)
  * against the vec-carry path (`Pipeline.VecCarry`: embedding computed once
  * per mention upstream and carried through the bucket shuffle) at both
  * parallelism widths, on a repetitive control of identical row and pair
  * count.
  *
  * The vec-carry leg times the WHOLE strategy as the pipeline runs it — the
  * per-mention encode executes inside the measured job (withColumn before
  * `PairGen`), not pre-materialized — so the numbers answer the actual
  * decision `Pipeline.VecAuto` makes: encode-once-plus-fatter-shuffle vs
  * encode-per-bucket-occurrence-with-lean-shuffle.
  *
  * Usage: runMain graft.SurfaceCardBench [nMentions=3000000] [outPath=BENCH/SURFACE_CARD.md] [reps=2]
  */
object SurfaceCardBench {

  /** Uniform 64-mention keys, ~5 distinct surfaces per key (the transcript
    * corpus's shape: memo hit rate ≈ 1). */
  def repetitiveMentions(spark: SparkSession, n: Long, keySize: Long = 64L): DataFrame =
    SkewBench.uniformMentions(spark, n, keySize)

  /** Same key layout, every surface globally unique (memo hit rate ≈ 0; the
    * regime of free-text mention spans at 100 TB). */
  def uniqueMentions(spark: SparkSession, n: Long, keySize: Long = 64L): DataFrame =
    spark.range(0, n).select(
      (col("id") + 1).as("mention_id"),
      concat(lit("u"), (col("id") / keySize).cast("long"), lit(" w"),
        (col("id") / keySize).cast("long")).as("blocking_key"))
      .withColumn("tokens", split(col("blocking_key"), " "))
      .withColumn("mention", concat(col("blocking_key"), lit(" v"), col("mention_id")))

  private val embedVecUdf =
    udf((s: String) => pkel.scoring.Embedder.default.encode(Option(s).getOrElse("")))

  /** Bump when repetitiveMentions/uniqueMentions (this file's own
    * generators) change — SkewBench.generatorVersion covers only SkewBench's
    * corpora, so this bench versions its caches itself (round-5 advice). */
  private val generatorVersion = 2

  private def materialize(spark: SparkSession, df: DataFrame, tag: String): String = {
    // corpus caches key on (generator version, tag) so a generator edit can
    // never silently reuse a stale distribution (round-5 advice)
    val path = s"/dev/shm/pkel-surfcard/v${generatorVersion}_$tag"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
      df.write.mode("overwrite").parquet(path)
    path
  }

  private def measure(spark: SparkSession, path: String, carry: Boolean): (Long, Double) = {
    val keyed = spark.read.parquet(path)
    val input = if (carry) keyed.withColumn("vec", embedVecUdf(col("mention"))) else keyed
    val t0 = System.nanoTime()
    val n = pkel.scoring.PairScorer.scoreCandidates(input).count()
    (n, n / ((System.nanoTime() - t0) / 1e9))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3000000L)
    val outPath = args.lift(1).getOrElse("BENCH/SURFACE_CARD.md")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)

    val prep = Bench.session("32")
    val repPath = materialize(prep, repetitiveMentions(prep, n), s"rep_$n")
    val uniqPath = materialize(prep, uniqueMentions(prep, n), s"uniq_$n")
    val warmPath = materialize(prep, uniqueMentions(prep, math.max(10000L, n / 100)), s"warm_$n")
    // what VecAuto sees: KMV distinct-surface estimates for both corpora
    def kmv(path: String): Long = prep.read.parquet(path)
      .agg(pkel.functions.Functions.kmv_distinct(col("mention"), k = 256)).head().getLong(0)
    val kmvRep = kmv(repPath); val kmvUniq = kmv(uniqPath)
    prep.stop()

    final case class Cell(corpus: String, carry: Boolean, cpus: Int, pairs: Long, pps: Double)
    val cells = scala.collection.mutable.ArrayBuffer.empty[Cell]
    for (cpus <- Seq(8, 32)) {
      val spark = Bench.session(cpus.toString)
      try {
        measure(spark, warmPath, carry = false) // JIT + codegen warm-up
        measure(spark, warmPath, carry = true)
        for {
          (corpus, path) <- Seq("repetitive" -> repPath, "unique" -> uniqPath)
          carry <- Seq(false, true)
        } {
          val best = (1 to reps).map(_ => measure(spark, path, carry)).maxBy(_._2)
          cells += Cell(corpus, carry, cpus, best._1, best._2)
          System.err.println(f"[surfcard] $corpus carry=$carry @local[$cpus]: " +
            f"${best._1} pairs at ${best._2 / 1e6}%.1fM pairs/s")
        }
      } finally spark.stop()
    }

    def pps(corpus: String, carry: Boolean, cpus: Int): Double =
      cells.find(c => c.corpus == corpus && c.carry == carry && c.cpus == cpus).map(_.pps).getOrElse(0.0)
    val pairsRep = cells.find(_.corpus == "repetitive").map(_.pairs).getOrElse(0L)
    val pairsUniq = cells.find(_.corpus == "unique").map(_.pairs).getOrElse(0L)
    val rows = (for {
      (corpus, pairs) <- Seq(("repetitive", pairsRep), ("unique", pairsUniq))
      carry <- Seq(false, true)
    } yield {
      val p8 = pps(corpus, carry, 8); val p32 = pps(corpus, carry, 32)
      val mode = if (carry) "vec-carry" else "memo"
      f"| $corpus | $mode | $pairs | ${p8 / 1e6}%.1fM | ${p32 / 1e6}%.1fM |"
    }).mkString("\n|")

    val memoWins32 = pps("unique", carry = false, 32) >= pps("unique", carry = true, 32)
    val md =
      f"""# Surface-cardinality stress: memo vs vec-carry (${java.time.LocalDate.now()})
         |
         |$n%,d mentions, 64-mention uniform keys; "repetitive" holds ~5 distinct
         |surfaces per key (transcript shape, memo hit rate ≈ 1), "unique" makes
         |every surface globally distinct (memo hit rate ≈ 0). Best of $reps per
         |cell after JIT warm-up; the vec-carry leg times encode + fatter shuffle
         |inside the measured job, exactly as `Pipeline.VecCarry` runs it.
         |
         || corpus | vec sourcing | scored pairs | pairs/s @8 | pairs/s @32 |
         ||---|---|---|---|---|
         |$rows
         |
         |KMV distinct-surface estimates (what `Pipeline.VecAuto` keys on,
         |k=256): repetitive ≈ $kmvRep%,d, unique ≈ $kmvUniq%,d (memo cap
         |${pkel.scoring.PairScorer.MemoCap}%,d per partition).
         |
         |Reading: the bucket kernel encodes O(members) per bucket, not
         |O(pairs) — each member's embedding is computed once per bucket visit
         |and every pair is then a cached-matrix lookup — so with this repo's
         |cheap hashed-n-gram encoder the memo path ${if (memoWins32) "still wins (or ties)"
      else "loses"} even at 100%% unique surfaces, while vec-carry pays
         |dim×4 bytes per member through the bucket shuffle. Vec-carry is the
         |right choice only when the ENCODER is expensive (a real bi-encoder
         |model costs ~10^3× a dot product, making encode-per-bucket-visit
         |the bottleneck) AND the surface universe outgrows the memo — which
         |is exactly `Pipeline.VecAuto`'s rule: carry iff `costlyEncoder` and
         |the KMV estimate exceeds the threshold (default: the memo cap).
         |With the offline stand-in encoder, auto therefore always rides the
         |memo path, matching the measurement above.
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outPath).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), md.getBytes("UTF-8"))
    println(md)
  }
}
