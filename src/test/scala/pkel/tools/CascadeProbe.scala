package pkel.tools

/** Width-scaling probe for the linking-cascade stage ('linked'), isolating
  * it from the rest of the pipeline: the full-job width pair measured the
  * cascade stage SLOWER at local[32] than local[8] (87 s → 158 s at 1M
  * convs), and this probe exists to reproduce/attribute that — wall plus
  * JVM GC time per rep, same corpus, one width per JVM.
  *
  * sbt "Test/runMain pkel.tools.CascadeProbe <cpus> <nConvs> [reps]"
  */
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val nConvs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Bench.session(cpus)
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val entries = pkel.ontology.Ontology.load()
    val path = s"/dev/shm/pkel-cascade-probe/keyed-$nConvs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val t = pkel.transcript.TranscriptSynth.generate(spark, entries, nConvs, seed = 42L)
      pkel.link.ExactLinker.withBlockingKey(pkel.app.Pipeline.extractMentions(t))
        .drop("ordering_ok")
        .write.mode("overwrite").parquet(path)
    }
    (1 to reps).foreach { rep =>
      val keyed = spark.read.parquet(path)
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val linked = pkel.link.Cascade.run(spark, keyed, entries)
      val byStatus = linked.groupBy("status").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(",")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CASCADE cpus=$cpus convs=$nConvs rep=$rep sec=$sec%.2f gc_ms=${gcMs - gc0} [$byStatus]")
    }
    spark.stop()
  }
}
