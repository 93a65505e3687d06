package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch measurement probe for round 6 (not part of the driver contract).
  * Prints per-stage task counts + runtimes for the pair-scoring probe so the
  * AQE-coalescing hypothesis is checked against executed stages, not guesses. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${ms.getOrElse(-1L)}%6d ms  ${si.name.take(90)}")
      }
    })
    val keyedPath = Bench.materializeKeyed(spark, 1000000L)
    val keyed = spark.read.parquet(keyedPath)
    (1 to 2).foreach { rep =>
      stages.clear()
      val df = pkel.scoring.PairScorer.scoreCandidates(keyed)
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rep$rep pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      Thread.sleep(500)
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
