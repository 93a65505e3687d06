package pkel.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-checkpointed table IO with per-partition lineage metrics.
  *
  * The north rule asks for Iceberg tables with per-stage checkpoints and an
  * idempotent resume. No Iceberg runtime jar ships in this offline image
  * (SURVEY.md §7.1), so the contract is a trait (`StageStore`) with two
  * interchangeable offline realizations, proving the backend swap is a
  * config decision, not a code change:
  *
  *  - [[TableIO]] — snapshot-marker Parquet: stage dir + `_COMMIT` marker
  *    file; the marker write is the atomic commit point.
  *  - [[CatalogTableIO]] — catalog-pointer Parquet (Iceberg-shaped):
  *    immutable per-fingerprint snapshot directories plus a per-stage
  *    catalog pointer file whose overwrite is the atomic commit point —
  *    the same metadata-pointer-swap shape `iceberg-spark-runtime` uses,
  *    with old snapshots retained on disk.
  *
  * Both run through the Hadoop `FileSystem` resolved from the data path
  * itself — on a cluster the marker/pointer lands on the same HDFS/S3/file
  * scheme as the parquet it guards (driver-local `java.nio` would silently
  * write markers to the driver's disk instead).
  */
trait StageStore {
  protected def spark: SparkSession
  def root: String
  def runId: String

  /** True iff `stage` has a committed snapshot for `fingerprint`. */
  def isCommitted(stage: String, fingerprint: String): Boolean

  /** Location of the committed snapshot for `stage` (impl-specific). */
  protected def committedLocation(stage: String): String

  /** Write `df` as the committed output of `stage` (overwrites any partial
    * previous attempt), record metrics, return the re-read DataFrame. An
    * optional [[StageStore.Audit]] folds extra aggregate checks into the
    * commit's row-count action (zero additional Spark jobs). */
  def commit(stage: String, df: DataFrame, fingerprint: String,
      audit: Option[StageStore.Audit] = None): DataFrame

  /** Idempotent stage execution: replay from the committed snapshot when the
    * fingerprint matches, else compute + commit. Audits run at commit time
    * only — a committed snapshot has already passed its audit. */
  final def readOrCompute(stage: String, fingerprint: String,
      audit: Option[StageStore.Audit] = None)(compute: => DataFrame): DataFrame =
    if (isCommitted(stage, fingerprint)) spark.read.parquet(committedLocation(stage))
    else commit(stage, compute, fingerprint, audit)

  /** One action for total-rows + audit aggregates: `count(*)` at index 0,
    * the audit's columns after it. The audit's `check` fails the commit
    * before the marker/pointer write, so a failed audit leaves the stage
    * uncommitted (the next run recomputes instead of resuming bad data). */
  protected def countAndAudit(out: DataFrame, audit: Option[StageStore.Audit]): Long = {
    val aggCols = count(lit(1)).as("rows_total") +: audit.map(_.aggs).getOrElse(Seq.empty)
    val row = out.agg(aggCols.head, aggCols.tail: _*).head()
    audit.foreach(_.check(row))
    row.getLong(0)
  }

  protected def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  protected def readSmallFile(p: Path): Option[String] = {
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  protected def writeSmallFile(p: Path, content: String): Unit = {
    val os = fs(p).create(p, true) // overwrite: this write is the atomic point
    try os.write(content.getBytes(StandardCharsets.UTF_8))
    finally os.close()
  }

  /** Per-partition lineage counters appended to the metrics table
    * (north rule: "per-partition lineage + counter metrics"). */
  protected def writeMetrics(stage: String, df: DataFrame, totalRows: Long, wallMs: Long): Unit = {
    val perPartition = df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .withColumn("total_rows", lit(totalRows))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("committed_at", current_timestamp())
    perPartition.write.mode("append").parquet(s"$root/_metrics")
  }

  /** Append named counter rows to the metrics table (silent-cap visibility:
    * e.g. LSH dropped-bucket counts). Counters reuse the per-partition
    * lineage schema — `stage` = "<stage>.<counter>", `rows_out` = value,
    * `partition_id` = −1 marks a run-level counter — so one parquet schema
    * serves both row kinds and `metrics()` reads them together. */
  final def appendCounters(stage: String, counters: Seq[(String, Long)]): Unit =
    if (counters.nonEmpty) {
      spark.createDataFrame(counters).toDF("counter", "value")
        .select(
          lit(-1).as("partition_id"),
          col("value").as("rows_out"),
          lit(runId).as("run_id"),
          concat(lit(stage + "."), col("counter")).as("stage"),
          col("value").as("total_rows"),
          lit(0L).as("wall_ms"),
          current_timestamp().as("committed_at"))
        .coalesce(1)
        .write.mode("append").parquet(s"$root/_metrics")
    }

  def metrics(): DataFrame = spark.read.parquet(s"$root/_metrics")
}

object StageStore {
  /** Commit-time audit: `aggs` ride the SAME `agg()` as the commit's total
    * row count (one Spark job for both), `check` receives the aggregate row
    * with `rows_total` at index 0 followed by `aggs` in order and throws to
    * veto the commit. This is how the pipeline's mention-id collision audit
    * shares the stage-1 metrics pass instead of running its own job. */
  final case class Audit(aggs: Seq[org.apache.spark.sql.Column],
      check: org.apache.spark.sql.Row => Unit)

  /** Config-selected backend — the "Iceberg swap is config-only" seam. */
  def forBackend(backend: String, spark: SparkSession, root: String, runId: String): StageStore =
    backend match {
      case "snapshot" => new TableIO(spark, root, runId)
      case "catalog" => new CatalogTableIO(spark, root, runId)
      case other => throw new IllegalArgumentException(
        s"unknown StageStore backend '$other' (snapshot | catalog)")
    }
}

/** Snapshot-marker backend: a stage directory is committed once its
  * `_COMMIT` marker (fingerprint + row count) exists. */
final class TableIO(protected val spark: SparkSession, val root: String,
    val runId: String) extends StageStore {

  private def stageDir(stage: String) = s"$root/$stage"
  private def markerPath(stage: String) = new Path(s"$root/$stage/_COMMIT")

  override protected def committedLocation(stage: String): String = stageDir(stage)

  def isCommitted(stage: String, fingerprint: String): Boolean =
    readSmallFile(markerPath(stage))
      .exists(_.linesIterator.exists(_ == s"fingerprint=$fingerprint"))

  def commit(stage: String, df: DataFrame, fingerprint: String,
      audit: Option[StageStore.Audit] = None): DataFrame = {
    val dir = stageDir(stage)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
    val rows = countAndAudit(out, audit)
    val wallMs = (System.nanoTime() - t0) / 1000000
    writeMetrics(stage, out, rows, wallMs)
    writeSmallFile(markerPath(stage),
      s"fingerprint=$fingerprint\nrows=$rows\nrun_id=$runId\nwall_ms=$wallMs\n")
    out
  }
}

/** Catalog-pointer backend (Iceberg-shaped): each commit writes an IMMUTABLE
  * snapshot directory `stage/snap-<fingerprint>/` and then atomically
  * overwrites the per-stage pointer file `_catalog/<stage>.json` to name it.
  * Readers resolve through the pointer only, so a partial snapshot write is
  * invisible until the pointer swap — and superseded snapshots stay on disk
  * (time-travel-shaped history, like Iceberg's metadata lineage). */
final class CatalogTableIO(protected val spark: SparkSession, val root: String,
    val runId: String) extends StageStore {

  private def snapDir(stage: String, fingerprint: String) =
    s"$root/$stage/snap-$fingerprint"
  private def pointerPath(stage: String) = new Path(s"$root/_catalog/$stage.json")

  /** Minimal flat JSON (string values only) — no parser dependency. */
  private def toJson(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")

  private def fromJson(s: String): Map[String, String] =
    "\"([^\"]+)\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
      .toMap

  private def pointer(stage: String): Option[Map[String, String]] =
    readSmallFile(pointerPath(stage)).map(fromJson)

  override protected def committedLocation(stage: String): String =
    pointer(stage).flatMap(_.get("location")).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for stage '$stage'"))

  def isCommitted(stage: String, fingerprint: String): Boolean =
    pointer(stage).exists { p =>
      p.get("fingerprint").contains(fingerprint) &&
        p.get("location").exists(loc => fs(new Path(loc)).exists(new Path(loc)))
    }

  def commit(stage: String, df: DataFrame, fingerprint: String,
      audit: Option[StageStore.Audit] = None): DataFrame = {
    val dir = snapDir(stage, fingerprint)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
    val rows = countAndAudit(out, audit)
    val wallMs = (System.nanoTime() - t0) / 1000000
    writeMetrics(stage, out, rows, wallMs)
    writeSmallFile(pointerPath(stage), toJson(Seq(
      "stage" -> stage, "fingerprint" -> fingerprint, "location" -> dir,
      "rows" -> rows.toString, "run_id" -> runId, "wall_ms" -> wallMs.toString)))
    out
  }
}
