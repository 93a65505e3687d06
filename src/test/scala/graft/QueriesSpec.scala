package graft

import org.apache.spark.sql.types.{ArrayType, MapType}
import pkel.SparkSpec

/** Driver-battery guards: scale-factor parsing is monotone, and every
  * registered query emits only scalar columns (the driver's hash/sort
  * comparator cannot order array cells — round-1 `q_doc_minhash_buckets` /
  * `q_mm_decode_stub` failure mode). */
class QueriesSpec extends SparkSpec {

  test("sfOf parses the numeric scale factor, not a substring") {
    assert(Queries.sfOf("/root/testdata/sf0.001") == 0.001)
    assert(Queries.sfOf("/root/testdata/sf0.01") == 0.01)
    assert(Queries.sfOf("/root/testdata/sf0.1") == 0.1)
    assert(Queries.sfOf("/root/testdata/sf1") == 1.0)
    assert(Queries.sfOf("/root/testdata/sf10") == 10.0)
  }

  test("oracle dumps are written at the driver's verify sf only") {
    assert(Queries.shouldDump("/root/testdata/sf0.01"))
    assert(!Queries.shouldDump("/root/testdata/sf0.1"))
    assert(!Queries.shouldDump("/root/testdata/sf0.001"))
    assert(!Queries.shouldDump("/root/testdata/sf1"))
  }

  test("convsForSf is monotone in sf and floored") {
    val sfs = Seq(0.001, 0.01, 0.1, 1.0, 10.0)
    val convs = sfs.map(Queries.convsForSf(_, base = 100L))
    assert(convs == convs.sorted, s"not monotone: $convs")
    assert(convs.head == 100L)
    assert(Queries.convsForSf(1.0, 100L) > Queries.convsForSf(0.1, 100L) * 5)
  }

  test("all battery queries emit scalar (sortable) columns only") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    // rows-only queries included: the driver still sorts+hashes their output
    for ((name, fn) <- SparkEntry.queries if !name.startsWith("q_el_")) {
      val schema = fn(spark, dir).schema
      val bad = schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType])
      assert(bad.isEmpty, s"$name has non-scalar columns: ${bad.map(_.name).mkString(",")}")
    }
  }

  test("simhash banding recall: any pair within hamming 3 shares a band (pigeonhole)") {
    // pure property of the 4×16-bit banding the near-dup query relies on:
    // flipping ≤ 3 bits can touch at most 3 of the 4 bands, so at least one
    // band stays identical — the band-equality join cannot miss such a pair
    val rnd = new scala.util.Random(5)
    def hex16(v: Long): String = f"$v%016x"
    def bands(sig: String): Seq[String] = (0 until 4).map(b => sig.substring(b * 4, b * 4 + 4))
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong()
      var b = a
      val flips = rnd.nextInt(4) // 0..3 bit flips
      (1 to flips).foreach(_ => b ^= (1L << rnd.nextInt(64)))
      val shared = bands(hex16(a)).zip(bands(hex16(b))).exists { case (x, y) => x == y }
      assert(shared, s"hamming<=3 pair missed by banding: ${hex16(a)} vs ${hex16(b)}")
    }
  }

  test("de-arrayified queries still return rows") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    assert(Queries.docMinhashBuckets(spark, dir).count() > 0)
    assert(Queries.mmDecodeStub(spark, dir).count() > 0)
    assert(Queries.embedLabelStats(spark, dir).count() > 0)
    assert(Queries.docShingleJaccard(spark, dir).count() > 0)
  }

  test("streaming dedup query is re-runnable within one JVM") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val n1 = Queries.streamDedupExact(spark, dir).count()
    val n2 = Queries.streamDedupExact(spark, dir).count()
    assert(n1 > 0 && n1 == n2)
  }

  test("releaseCaches leaves EL queries re-runnable with identical results") {
    // the bench calls releaseCaches between its warm pass and the timed
    // battery; a released-but-still-referenced DataFrame (or a stale cache
    // entry surviving the release) would break or skew the timed run
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val before = Queries.elCascade(spark, dir).collect().map(_.toSeq).toSet
    Queries.releaseCaches(spark)
    assert(spark.sharedState.cacheManager.isEmpty, "cached plans must be dropped")
    val after = Queries.elCascade(spark, dir).collect().map(_.toSeq).toSet
    assert(after == before, "post-release rerun must reproduce the same output")
  }
}
