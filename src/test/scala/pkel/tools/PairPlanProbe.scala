package pkel.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: final AQE plan of candidate pair generation — checks whether
  * the repeated blocking_key exchanges are deduplicated by stage reuse. */
object PairPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val keyed = (1L to 5000L).map(i => (i, if (i % 7 == 0) "auc inf" else "cl", Seq("cl"), s"m$i"))
      .toDF("mention_id", "blocking_key", "tokens", "mention")
    val pairs = pkel.blocking.PairGen.candidatePairsWithFeatures(
      keyed, pkel.blocking.PairGen.Config())
    println("PAIRS=" + pairs.count())
    val plan = pairs.queryExecution.executedPlan.toString
    println(plan)
    println("== exchange lines: " + plan.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println("== reused lines:   " + plan.linesIterator.count(l => l.contains("ReusedExchange") || l.contains("reused")))
    println("== shuffle stages: " + plan.linesIterator.count(_.contains("ShuffleQueryStage")))
    spark.stop()
  }
}
