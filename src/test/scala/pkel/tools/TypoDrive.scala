package pkel.tools

import org.apache.spark.sql.functions._
import pkel.ontology.Ontology
import pkel.transcript.TranscriptSynth

object TypoDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    val entries = Ontology.load()
    val seed = 42L
    val transcripts = TranscriptSynth.generate(spark, entries, 400, seed = seed)
    val mentions = pkel.app.Pipeline.extractMentions(transcripts)
    val vs = TranscriptSynth.variants(entries)
    val goldUdf = udf((convId: String, turn: Int) =>
      TranscriptSynth.goldForVariants(vs, seed, convId.stripPrefix("c").toLong, turn).orNull)
    val withGold = mentions.withColumn("gold", goldUdf(col("conv_id"), col("turn_idx")))
    val preds = pkel.link.Cascade.run(spark, withGold.drop("ordering_ok"), entries)
    val j = preds.join(withGold.select("mention_id", "gold", "text", "span_start", "span_end"), "mention_id")
      .withColumn("mention", expr("substring(text, span_start+1, span_end-span_start)"))
    println("== wrong or unlinked vs gold (gold != Q100) ==")
    j.filter(col("gold") =!= "Q100" && col("y_pred") =!= col("gold"))
      .groupBy("gold", "y_pred", "tier", "status", "mention").count()
      .orderBy(desc("count")).collect().take(40).foreach(r => println(r))
    spark.stop()
  }
}
