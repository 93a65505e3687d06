package pkel.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe: sbt "Test/runMain pkel.tools.ScaleProbe <cpus> <nConvs>" */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val nConvs = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = graft.Bench.session(cpus)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val entries = pkel.ontology.Ontology.load()
    val transcripts = pkel.transcript.TranscriptSynth.generate(spark, entries, nConvs, seed = 42L)
    val mentions = pkel.app.Pipeline.extractMentions(transcripts)
    val keyed = pkel.link.ExactLinker.withBlockingKey(mentions)
      .select("mention_id", "blocking_key", "tokens", "mention").persist()
    time("extract+key")(keyed.count())
    val pairs = time("pairgen") {
      val p = pkel.blocking.PairGen.candidatePairs(keyed.select("mention_id", "blocking_key", "tokens")).persist()
      println("  pairs=" + p.count()); p
    }
    println("  pairs partitions=" + pairs.rdd.getNumPartitions)
    val joined = time("featjoin") {
      val a = keyed.select(col("mention_id").as("src"), col("blocking_key").as("key_a"), col("mention").as("mention_a"))
      val b = keyed.select(col("mention_id").as("dst"), col("blocking_key").as("key_b"), col("mention").as("mention_b"))
      val j = pairs.join(a, "src").join(b, "dst").persist()
      println("  joined=" + j.count()); j
    }
    println("  joined partitions=" + joined.rdd.getNumPartitions)
    time("score") {
      println("  scored=" + pkel.scoring.PairScorer.scorePairs(joined).count())
    }
    spark.stop()
  }
}
