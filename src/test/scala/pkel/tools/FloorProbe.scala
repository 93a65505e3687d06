package pkel.tools

import org.apache.spark.scheduler._

/** Serial-floor probe: tiny corpus, stage-level timings.
  * sbt "Test/runMain pkel.tools.FloorProbe <cpus> <aqe>" */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val aqe = args.lift(1).getOrElse("true")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${ms.getOrElse(-1L)}%6d ms  ${si.name.take(60)}")
      }
    })
    // warm
    graft.Bench.pairThroughput(spark, 100)
    stages.clear()
    val t0 = System.nanoTime()
    val (n, pps) = graft.Bench.pairThroughput(spark, 1000)
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.2f s  pairs=$n pps=$pps%.0f  (aqe=$aqe cpus=$cpus)")
    Thread.sleep(500)
    stages.forEach(s => println(s))
    spark.stop()
  }
}
