package pkel.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import pkel.SparkSpec

/** Structured Streaming coverage (SURVEY.md §2.10).
  *
  * The reference is a pure batch pipeline, so streaming is not required for
  * parity — this spec documents the engine's streaming path for transcript
  * ingest: file stream → watermark → event-time windowed aggregation,
  * verified against the equivalent batch aggregation over the same data.
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed aggregation matches batch over the events table") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // restrict the file stream to the events table only
    val streamIn = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)

    val agg = streamIn
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → event-time type
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_agg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamedResult = spark.table("stream_agg")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))

    val batchResult = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val s = streamedResult.collect().map(_.toString).sorted
    val b = batchResult.collect().map(_.toString).sorted
    assert(s.nonEmpty)
    assert(s.sameElements(b), "streaming windowed agg must equal batch agg")
  }
}
