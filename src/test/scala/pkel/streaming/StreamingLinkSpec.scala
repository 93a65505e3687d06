package pkel.streaming

// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import pkel.SparkSpec

/** Stateful-streaming semantics of the incremental linker: per-key cluster
  * state must survive across micro-batches (flatMapGroupsWithState), and the
  * canonical id must be FIRST-WINS — stable once emitted, even when a
  * smaller mention id arrives in a later batch. MemoryStream gives exact
  * control of batch boundaries, so the cross-batch behavior is pinned
  * deterministically. */
class StreamingLinkSpec extends SparkSpec {

  test("cluster state persists across micro-batches; canonical ids are first-wins") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(String, Long)]
    val q = StreamingLink.assignCanonical(in.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_link")
      .start()
    try {
      // batch 1: two keys appear; within-batch min elects the canonical
      in.addData(("k1", 5L), ("k1", 7L), ("k2", 9L))
      q.processAllAvailable()
      // batch 2: k1 gets a SMALLER id (must attach, not re-elect), k3 is new
      in.addData(("k1", 3L), ("k3", 1L))
      q.processAllAvailable()

      val rows = spark.table("stream_link")
        .as[StreamingLink.Assignment]
        .collect()
        .map(a => (a.blockingKey, a.mentionId, a.canonicalId, a.isNewCluster, a.nMembersAfter))
        .sortBy(t => (t._1, t._2))
      assert(rows.toSeq == Seq(
        ("k1", 3L, 5L, false, 3L), // later, smaller id attaches to the existing cluster
        ("k1", 5L, 5L, true, 1L),
        ("k1", 7L, 5L, false, 2L),
        ("k2", 9L, 9L, true, 1L),
        ("k3", 1L, 1L, true, 1L)))
    } finally q.stop()
  }

  test("same operator runs in batch mode with identical per-group semantics") {
    import spark.implicits._
    val ds = Seq(("k1", 7L), ("k1", 5L), ("k2", 9L)).toDS()
    val rows = StreamingLink.assignCanonical(ds).collect()
      .map(a => (a.blockingKey, a.mentionId, a.canonicalId, a.isNewCluster))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      ("k1", 5L, 5L, true),
      ("k1", 7L, 5L, false),
      ("k2", 9L, 9L, true)))
  }
}
