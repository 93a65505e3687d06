package org.apache.spark.sql.pkelbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion (the
  * public API for this disappeared in Spark 4's Column refactor; extension
  * libraries conventionally host a shim inside the sql package namespace). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `SparkSession.internalCreateDataFrame` shim: build a DataFrame over an
    * RDD of InternalRows (UnsafeRows) without the external-Row encoder round
    * trip — the per-row boxing of that round trip is a GC bottleneck for
    * billion-row kernel outputs. */
  def internalDf(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Drain the async listener bus (`private[spark]`) so a test counting
    * Spark jobs via a SparkListener observes every event before asserting. */
  def waitForListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
