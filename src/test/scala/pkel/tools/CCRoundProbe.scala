package pkel.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Times one large-star/small-star round over a saved edge parquet in two
  * physical formulations — the relational groupBy(min)+join shape and a
  * window-function shape (one exchange per star) — and the star-forest
  * convergence test. `Test/runMain pkel.tools.CCRoundProbe <edges.parquet>`.
  */
object CCRoundProbe {
  def largeStarRel(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
    val mins = bidir.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    bidir.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }
  def smallStarRel(edges: DataFrame): DataFrame = {
    val dir = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    val nbrEdges = dir.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val selfEdges = mins.select(col("u").as("src"), col("m").as("dst"))
    nbrEdges.union(selfEdges).distinct()
  }
  def largeStarWin(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
    val w = Window.partitionBy("u")
    bidir.withColumn("m", least(min(col("v")).over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
  }
  def smallStarWin(edges: DataFrame): DataFrame = {
    val dir = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
    val w = Window.partitionBy("u")
    dir.withColumn("m", min(col("v")).over(w))
      .select(
        when(col("v") === col("m"), col("u")).otherwise(col("v")).as("src"),
        col("m").as("dst"))
      .distinct()
  }
  /** True iff the canonical edge set is a star forest (every src exactly
    * once, no dst also a src) — which is exactly the fixpoint of
    * smallStar∘largeStar, detectable without running the extra round. */
  def isStarForest(edges: DataFrame): Boolean = {
    edges.select(col("src").as("n"), lit(1L).as("s"))
      .union(edges.select(col("dst").as("n"), lit(0L).as("s")))
      .groupBy("n").agg(sum("s").as("srcCnt"), count(lit(1)).as("tot"))
      .filter(col("srcCnt") > 1 || (col("srcCnt") === 1 && col("tot") > col("srcCnt")))
      .limit(1).isEmpty
  }
  def signature(edges: DataFrame): (Long, Long) = {
    val row = edges.select(
      greatest(col("src"), col("dst")).as("a"), least(col("src"), col("dst")).as("b"))
      .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/dev/shm/pkel-width-star/w32/edges")
    val width = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$width]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.driver.memory", "24g")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccround] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e0 = timed("iter00 canonicalize")(
      spark.read.parquet(path)
        .select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
        .distinct().localCheckpoint(true))
    println(s"[ccround] canonical edges: ${e0.count()}")

    val rel1 = timed("round1 relational")(smallStarRel(largeStarRel(e0)).localCheckpoint(true))
    val win1 = timed("round1 window")(smallStarWin(largeStarWin(e0)).localCheckpoint(true))
    val sigRel = timed("sig rel")(signature(rel1))
    val sigWin = timed("sig win")(signature(win1))
    println(s"[ccround] sig rel=$sigRel win=$sigWin equal=${sigRel == sigWin}")

    println(s"[ccround] starForest(e0) = ${timed("forest test e0")(isStarForest(e0))}")
    println(s"[ccround] starForest(round1) = ${timed("forest test round1")(isStarForest(rel1))}")

    val rel2 = timed("round2 relational")(smallStarRel(largeStarRel(rel1)).localCheckpoint(true))
    val win2 = timed("round2 window")(smallStarWin(largeStarWin(win1)).localCheckpoint(true))
    println(s"[ccround] round2 sig equal=${signature(rel2) == signature(win2)} " +
      s"converged=${signature(rel2) == sigRel}")
    spark.stop()
  }
}
