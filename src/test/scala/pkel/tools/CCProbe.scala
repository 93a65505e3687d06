package pkel.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q_el_clusters path at a given sf:
  * `Test/runMain pkel.tools.CCProbe [sfDir]`. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/pkel-bench")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val entries = pkel.ontology.Ontology.load()
    val nConvs = graft.Queries.convsForSf(graft.Queries.sfOf(sfDir), 100L)
    val transcripts = pkel.transcript.TranscriptSynth.generate(spark, entries, nConvs, seed = 42L)
    val mentions = timed("synth+extract")(
      pkel.app.Pipeline.extractMentions(transcripts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    println(s"[ccprobe] mentions: ${mentions.count()}")

    val keyed = pkel.link.ExactLinker.withBlockingKey(mentions)
      .select("mention_id", "blocking_key", "tokens", "mention")
    timed("keyed count")(println(s"[ccprobe] keyed: ${keyed.count()}"))

    val scored = pkel.scoring.PairScorer.scoreCandidates(keyed)
    timed("score pairs")(println(s"[ccprobe] scored: ${scored.count()}"))

    val edges = scored.filter(col("score") >= 0.9).select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("edges")(println(s"[ccprobe] edges: ${edges.count()}"))

    val (comps, iters) = timed("cc fixpoint")(
      pkel.cluster.ConnectedComponents.runWithStats(spark, edges))
    println(s"[ccprobe] cc iterations: $iters")
    timed("cc agg")(println(s"[ccprobe] nodes: ${comps.count()}"))
    spark.stop()
  }
}
