package pkel.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.pkelbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

import pkel.scoring.Similarity

/** Custom Catalyst expressions for the pairwise similarity kernel.
  *
  * These are the codegen-friendly alternative to the Scala-UDF path: the
  * generated code calls the static kernel directly, so the comparison stays
  * inside whole-stage codegen with no UDF boxing or encoder round-trip
  * (SURVEY.md §4.3 — a performance refinement over `udf {}`). Usable from
  * both the Column API (`Functions.indel_ratio`) and SQL after
  * `Functions.register(spark)`.
  */
case class IndelRatio(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, string) arguments")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "indel_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Similarity.indelRatio(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"pkel.scoring.Similarity.indelRatio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IndelRatio =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, string) arguments")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Similarity.jaroWinkler(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"pkel.scoring.Similarity.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object Functions {
  def indel_ratio(a: Column, b: Column): Column =
    Bridge.column(IndelRatio(Bridge.expression(a), Bridge.expression(b)))

  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(a), Bridge.expression(b)))

  /** KMV distinct-count sketch aggregate (deterministic, mergeable). */
  def kmv_distinct(a: Column, k: Int = 64): Column =
    Bridge.column(KmvDistinct(Bridge.expression(a), k).toAggregateExpression())

  /** Register `indel_ratio` / `jaro_winkler` / `kmv_distinct` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("indel_ratio", exprs => IndelRatio(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("jaro_winkler", exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("kmv_distinct", {
      case Seq(c) => KmvDistinct(c)
      case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
        KmvDistinct(c, k)
      case other => throw new IllegalArgumentException(
        s"kmv_distinct expects (column[, k literal]), got ${other.length} args")
    }, "scala_udf")
  }
}
