package pkel.functions

import org.apache.spark.sql.functions._

import pkel.SparkSpec

/** KMV sketch aggregate: exact below k, mergeable (partitioning-invariant),
  * sane accuracy above k, and SQL-registered. */
class KmvDistinctSpec extends SparkSpec {

  import spark.implicits._

  test("exact count below k") {
    val df = (1 to 40).map(i => s"v$i").toDF("s")
    val got = df.agg(Functions.kmv_distinct(col("s"))).head().getLong(0)
    assert(got == 40L)
    // duplicates don't inflate it
    val dup = ((1 to 40) ++ (1 to 40)).map(i => s"v$i").toDF("s")
    assert(dup.agg(Functions.kmv_distinct(col("s"))).head().getLong(0) == 40L)
  }

  test("partials merge: estimate is identical at any partitioning") {
    val data = (1 to 5000).map(i => s"item-$i").toDF("s")
    val one = data.repartition(1).agg(Functions.kmv_distinct(col("s"))).head().getLong(0)
    val many = data.repartition(37).agg(Functions.kmv_distinct(col("s"))).head().getLong(0)
    assert(one == many, s"sketch must be merge-order-invariant: $one vs $many")
  }

  test("estimate is within 30% of truth above k") {
    val n = 5000
    val data = (1 to n).map(i => s"item-$i").toDF("s")
    val est = data.agg(Functions.kmv_distinct(col("s"))).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.30, s"estimate $est too far from $n")
  }

  test("registered for SQL use") {
    Functions.register(spark)
    (1 to 10).map(i => s"x$i").toDF("s").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_distinct(s) AS d FROM kmv_in").head().getLong(0)
    assert(got == 10L)
  }

  test("SQL k argument is honored, not silently dropped") {
    Functions.register(spark)
    (1 to 200).map(i => s"y$i").toDF("s").createOrReplaceTempView("kmv_in_k")
    // k=256 > 200 distinct values → the sketch is exact; the default k=64
    // would return an estimate (and 64-buffer exactness is impossible at 200)
    val exact = spark.sql("SELECT kmv_distinct(s, 256) AS d FROM kmv_in_k").head().getLong(0)
    assert(exact == 200L, s"k argument ignored: got $exact")
    val estimated = spark.sql("SELECT kmv_distinct(s) AS d FROM kmv_in_k").head().getLong(0)
    assert(estimated != 200L || exact == estimated) // default path still runs
    intercept[Exception](spark.sql("SELECT kmv_distinct(s, 1, 2) FROM kmv_in_k").collect())
  }
}
