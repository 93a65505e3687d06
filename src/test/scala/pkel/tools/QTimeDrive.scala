package pkel.tools

import org.apache.spark.sql.SparkSession

/** Times one battery query N times in a single JVM:
  * `Test/runMain pkel.tools.QTimeDrive <query> [reps] [sfDir]`.
  * Separates genuinely-slow plans from VM-minute noise and JIT warm-up. */
object QTimeDrive {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_doc_shingle_jaccard")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/pkel-bench")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qtime] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
