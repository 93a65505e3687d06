package pkel.io

import java.nio.file.{Files, Paths}

import pkel.SparkSpec

/** One contract, two backends: the snapshot-marker store and the
  * Iceberg-shaped catalog-pointer store must satisfy the identical
  * StageStore behavior (partial-write recovery, committed replay,
  * fingerprint invalidation, lineage metrics) — proving the backend swap is
  * config-only. */
class TableIOSpec extends SparkSpec {

  import spark.implicits._

  private def contract(name: String, mk: String => StageStore): Unit =
    test(s"$name: partial output recomputed, committed replayed, fingerprint invalidates") {
      val root = Files.createTempDirectory(s"pkel_${name}_").toString
      val io = mk(root)
      var computes = 0
      def data = { computes += 1; Seq(1, 2, 3).toDF("x") }

      // simulate a killed run: stage dir exists with garbage, no commit record
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

  contract("snapshot", root => new TableIO(spark, root, "r1"))
  contract("catalog", root => new CatalogTableIO(spark, root, "r1"))

  test("backend factory resolves by config name and rejects unknowns") {
    val root = Files.createTempDirectory("pkel_factory_").toString
    assert(StageStore.forBackend("snapshot", spark, root, "r").isInstanceOf[TableIO])
    assert(StageStore.forBackend("catalog", spark, root, "r").isInstanceOf[CatalogTableIO])
    intercept[IllegalArgumentException](StageStore.forBackend("iceberg-someday", spark, root, "r"))
  }

  test("catalog backend keeps superseded snapshots and swaps the pointer atomically") {
    val root = Files.createTempDirectory("pkel_cat_hist_").toString
    val io = new CatalogTableIO(spark, root, "r1")
    io.readOrCompute("s", "fpA")(Seq(1).toDF("x"))
    io.readOrCompute("s", "fpB")(Seq(1, 2).toDF("x"))
    // pointer resolves to the NEW snapshot…
    assert(io.readOrCompute("s", "fpB")(fail("must replay")).count() == 2)
    assert(!io.isCommitted("s", "fpA") || io.isCommitted("s", "fpB"))
    // …while the superseded snapshot's data remains on disk (history retained)
    assert(Files.exists(Paths.get(s"$root/s/snap-fpA")))
    assert(Files.exists(Paths.get(s"$root/s/snap-fpB")))
  }
}
