package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch probe: reproduce the frozen bench's sequence (warm-up → battery →
  * releaseCaches → pair probe) to find what post-battery session state slows
  * the pair probe ~3× vs an isolated run. */
object ProbeBattery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Queries.setDumpEnabled(false)
    val skipBattery = args.contains("nobattery")
    val warmDir = "/root/testdata/sf0.001"
    if (!skipBattery) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (name.startsWith("q_el_"))
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        else try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      Queries.releaseCaches(spark)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        println(f"BATT $name ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      Queries.releaseCaches(spark)
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${ms.getOrElse(-1L)}%6d ms " +
          f"exec=${m.executorRunTime}%7d gc=${m.jvmGCTime}%6d shufR=${m.shuffleReadMetrics.totalBytesRead / 1024 / 1024}%5d MB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024 / 1024}%5d MB spill=${m.diskBytesSpilled / 1024 / 1024}%4d MB")
      }
    })
    val keyedPath = Bench.materializeKeyed(spark, 1000000L)
    (1 to 3).foreach { rep =>
      Thread.sleep(700)
      stages.clear()
      val t0 = System.nanoTime()
      val n = pkel.scoring.PairScorer.scoreCandidates(spark.read.parquet(keyedPath)).count()
      println(f"PROBE rep$rep pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      Thread.sleep(700)
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
