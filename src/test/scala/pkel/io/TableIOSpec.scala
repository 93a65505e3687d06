package pkel.io

import java.nio.file.{Files, Paths}

import pkel.SparkSpec

class TableIOSpec extends SparkSpec {

  import spark.implicits._

  test("partial (uncommitted) stage output is recomputed, committed stage is replayed") {
    val root = Files.createTempDirectory("pkel_tableio_").toString
    val io = new TableIO(spark, root, "r1")
    var computes = 0
    def data = { computes += 1; Seq(1, 2, 3).toDF("x") }

    // simulate a killed run: stage dir exists with garbage, no _COMMIT marker
    Files.createDirectories(Paths.get(s"$root/stage_a"))
    Files.writeString(Paths.get(s"$root/stage_a/part-garbage"), "not parquet")
    val out1 = io.readOrCompute("stage_a", "fp1")(data)
    assert(computes == 1 && out1.count() == 3)

    // committed: replayed without recompute
    val out2 = io.readOrCompute("stage_a", "fp1")(data)
    assert(computes == 1 && out2.count() == 3)

    // changed fingerprint (different params): recomputed
    io.readOrCompute("stage_a", "fp2")(data)
    assert(computes == 2)

    // metrics table has lineage rows for both commits
    val m = io.metrics()
    assert(m.filter(m("stage") === "stage_a").count() >= 2)
  }
}
