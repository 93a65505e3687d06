package pkel.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-checkpointed table IO with per-partition lineage metrics.
  *
  * The north rule asks for Iceberg tables with per-stage checkpoints and an
  * idempotent resume. No Iceberg runtime jar ships in this offline image
  * (SURVEY.md §7.1), so `TableIO` realizes the same contract on partitioned
  * Parquet with snapshot-commit semantics: a stage directory is only
  * considered committed once its `_COMMIT` marker (row count + params
  * fingerprint) exists; `readOrCompute` replays committed stages from disk
  * and recomputes the rest, so a killed run resumes idempotently. Swapping
  * the implementation to `iceberg-spark-runtime` is a write-path change only.
  *
  * Commit markers go through the Hadoop `FileSystem` resolved from the data
  * path itself — on a cluster the marker lands on the same HDFS/S3/file
  * scheme as the parquet it guards (driver-local `java.nio` would silently
  * write markers to the driver's disk instead).
  */
final class TableIO(spark: SparkSession, val root: String, val runId: String) {

  private def stageDir(stage: String) = s"$root/$stage"
  private def markerPath(stage: String) = new Path(s"$root/$stage/_COMMIT")
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isCommitted(stage: String, fingerprint: String): Boolean = {
    val m = markerPath(stage)
    val f = fs(m)
    f.exists(m) && {
      val in = f.open(m)
      try {
        val content = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
        content.linesIterator.exists(_ == s"fingerprint=$fingerprint")
      } finally in.close()
    }
  }

  /** Write `df` as the committed output of `stage` (overwrites any partial
    * previous attempt), record metrics, return the re-read DataFrame. */
  def commit(stage: String, df: DataFrame, fingerprint: String): DataFrame = {
    val dir = stageDir(stage)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
    val rows = out.count()
    val wallMs = (System.nanoTime() - t0) / 1000000
    writeMetrics(stage, out, rows, wallMs)
    val m = markerPath(stage)
    val os = fs(m).create(m, true) // overwrite: marker write is the atomic point
    try os.write(
      s"fingerprint=$fingerprint\nrows=$rows\nrun_id=$runId\nwall_ms=$wallMs\n"
        .getBytes(StandardCharsets.UTF_8))
    finally os.close()
    out
  }

  /** Idempotent stage execution: replay from the committed snapshot when the
    * fingerprint matches, else compute + commit. */
  def readOrCompute(stage: String, fingerprint: String)(compute: => DataFrame): DataFrame =
    if (isCommitted(stage, fingerprint)) spark.read.parquet(stageDir(stage))
    else commit(stage, compute, fingerprint)

  /** Per-partition lineage counters appended to the metrics table
    * (north rule: "per-partition lineage + counter metrics"). */
  private def writeMetrics(stage: String, df: DataFrame, totalRows: Long, wallMs: Long): Unit = {
    val perPartition = df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("total_rows", lit(totalRows))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("committed_at", current_timestamp())
    perPartition.write.mode("append").parquet(s"$root/_metrics")
  }

  def metrics(): DataFrame = spark.read.parquet(s"$root/_metrics")
}
