package pkel.tools
object NewQDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.elPromptTier(spark, "/root/testdata/sf0.001").show(20, false)
    graft.Queries.elContrastivePairs(spark, "/root/testdata/sf0.001").show(10, false)
    graft.Queries.embedIvfTopK(spark, "/root/testdata/sf0.001").show(10, false)
    spark.stop()
  }
}
