package pkel.tools

import org.apache.spark.sql.functions._

/** Decomposes the q_el_* shared-cache fill cost at a given sf with the
  * bench session config: synth → extract → exact → cascade → gold, then the
  * marginal cost of the eval-family queries over warm caches.
  * `Test/runMain pkel.tools.QElFillProbe [sfDir]` */
object QElFillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Queries.setDumpEnabled(false)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[elfill] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val entries = timed("ontology")(pkel.ontology.Ontology.load())
    val nConvs = graft.Queries.convsForSf(graft.Queries.sfOf(sfDir), 100L)
    val transcripts = pkel.transcript.TranscriptSynth.generate(
      spark, entries, nConvs, seed = 42L, tableRate = 0.08)
    timed("synth count")(println(s"  turns=${transcripts.count()}"))
    val mentions = pkel.app.Pipeline.extractMentions(transcripts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("extract+persist")(println(s"  mentions=${mentions.count()}"))
    val keyed = pkel.link.ExactLinker.withBlockingKey(mentions)
    timed("keyed")(keyed.write.format("noop").mode("overwrite").save())
    val featured = pkel.features.Features.withMentionFeatures(keyed, 5)
    timed("featured")(featured.write.format("noop").mode("overwrite").save())
    val index = pkel.ontology.Ontology.blockingIndex(entries)
    val exact = pkel.link.ExactLinker.link(spark, featured, index)
    timed("exact tier")(exact.write.format("noop").mode("overwrite").save())
    val linked = pkel.link.Cascade.run(spark, mentions.drop("ordering_ok"), entries,
      pkel.link.Cascade.Config())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("cascade+persist")(println(s"  linked=${linked.count()}"))
    // gold derivation (mirrors Queries.goldAssignments)
    val vs = pkel.transcript.TranscriptSynth.variants(entries)
    val tdVs = pkel.transcript.TranscriptSynth.tableDefaultVariants(entries)
    val safeVs = pkel.transcript.TranscriptSynth.tableSafeVariants(entries)
    val goldUdf = udf((convId: String, turn: Int, spanIdx: Int) =>
      pkel.transcript.TranscriptSynth.goldSpansForVariants(
        vs, seed = 42L, convId.stripPrefix("c").toLong, turn,
        tableRate = 0.08, tdVs = tdVs, safeVs = safeVs).lift(spanIdx).orNull)
    val goldDf = mentions.select(col("mention_id"),
      goldUdf(col("conv_id"), col("turn_idx"), col("span_idx")).as("gold"))
      .filter(col("gold").isNotNull)
    val assigns = linked.select(col("mention_id"), col("y_pred").as("pred"), col("blocking_key"))
      .join(goldDf, "mention_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("gold+persist")(println(s"  assigns=${assigns.count()}"))
    timed("pairwiseF1 global")(println(pkel.eval.Metrics.pairwiseF1(assigns.toDF())))
    timed("pairwiseF1 at-key")(println(pkel.eval.Metrics.pairwiseF1AtBlockingKey(assigns.toDF())))
    timed("analysis")(pkel.eval.Metrics.analysisResultsSplit(spark,
      assigns.withColumn("split",
        element_at(array(lit("test"), lit("train"), lit("validation")),
          (pmod(col("mention_id"), lit(3)) + 1).cast("int")))
        .select(col("split"), col("gold").as("label")), entries)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
