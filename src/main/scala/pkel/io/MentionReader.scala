package pkel.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for mention-record JSONL (sentences and table cells).
  *
  * Mirrors the reference scan semantics (`pk_el/utils.py:16-26`): malformed
  * lines are silently dropped (`mode=DROPMALFORMED`). Output is normalized to
  * the engine's mention schema: one row per mention with its first span
  * (each fixture record carries exactly one span).
  */
object MentionReader {

  private val spanType = ArrayType(StructType(Seq(
    StructField("start", IntegerType),
    StructField("end", IntegerType),
    StructField("text", StringType),
    StructField("label", StringType),
    StructField("token_start", IntegerType),
    StructField("token_end", IntegerType))))

  val sentenceSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("label", StringType),
    StructField("spans", spanType)))

  val tableSchema: StructType = StructType(sentenceSchema.fields.toSeq ++ Seq(
    StructField("table_html", StringType),
    StructField("caption", StringType),
    StructField("footer", StringType),
    StructField("table_id", StringType),
    StructField("row", IntegerType),
    StructField("col", IntegerType),
    StructField("row_idx", IntegerType),
    StructField("col_idx", IntegerType)))

  /** Read a JSONL path into the canonical mention DataFrame.
    * Columns: mention_id, text, label, span_start, span_end, is_table (+ table
    * context columns). `mention_id` is assigned by a deterministic global
    * row_number over (text, span_start, label) — fixture-scale only; at
    * transcript scale ids derive from (conv_id, turn_idx, span offsets). */
  def readJsonl(spark: SparkSession, path: String, isTable: Boolean): DataFrame = {
    val schema = if (isTable) tableSchema else sentenceSchema
    val raw = spark.read.option("mode", "DROPMALFORMED").schema(schema).json(path)
    val base = raw
      .withColumn("span_start", element_at(col("spans"), 1).getField("start"))
      .withColumn("span_end", element_at(col("spans"), 1).getField("end"))
      .drop("spans")
      .withColumn("is_table", lit(isTable))
    val withCtx =
      if (isTable) base
      else base
        .withColumn("table_html", lit("")).withColumn("caption", lit(""))
        .withColumn("footer", lit("")).withColumn("table_id", lit(""))
        .withColumn("row", lit(-1)).withColumn("col", lit(-1))
        .withColumn("row_idx", lit(-1)).withColumn("col_idx", lit(-1))
    val w = Window.orderBy("text", "span_start", "label", "row", "col")
    withCtx.withColumn("mention_id", row_number().over(w).cast(LongType))
  }
}
