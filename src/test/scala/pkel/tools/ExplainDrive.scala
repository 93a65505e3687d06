package pkel.tools

/** Dump the formatted plan of one query: sbt "Test/runMain pkel.tools.ExplainDrive q_agg_pushdown" */
object ExplainDrive {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_agg_pushdown")
    val spark = graft.Bench.session("4")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
