package pkel.functions

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.scoring.Similarity

class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("codegen expressions equal the kernel and work from SQL") {
    Functions.register(spark)
    val df = Seq(("hepatic clearance", "hepatic cleaance"), ("auc", "aumc"),
      ("", "x"), ("t1/2", "t1/2")).toDF("a", "b")
    val got = df.select(
      Functions.indel_ratio(col("a"), col("b")).as("ir"),
      Functions.jaro_winkler(col("a"), col("b")).as("jw"),
      expr("indel_ratio(a, b)").as("ir_sql")).collect()
    df.collect().zip(got).foreach { case (in, out) =>
      val a = in.getString(0); val b = in.getString(1)
      assert(out.getDouble(0) == Similarity.indelRatio(a, b))
      assert(out.getDouble(1) == Similarity.jaroWinkler(a, b))
      assert(out.getDouble(2) == out.getDouble(0))
    }
  }

  test("null propagation and codegen participation") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    val row = df.select(Functions.indel_ratio(col("a"), col("b"))).head()
    assert(row.isNullAt(0))
    // expression runs inside whole-stage codegen, not as a BatchEvalPython/UDF
    val big = spark.range(1000).select(
      concat(lit("cl"), col("id")).as("a"), concat(lit("clr"), col("id")).as("b"))
      .select(Functions.indel_ratio(col("a"), col("b")).as("s"))
      .filter(col("s") > 0)
    big.collect()
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
