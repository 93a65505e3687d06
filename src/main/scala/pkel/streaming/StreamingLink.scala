package pkel.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental entity canonicalization — the stateful-streaming
  * face of the linker (SURVEY.md §2.10): mentions arrive on a stream, are
  * grouped by blocking key, and each key's cluster state (canonical id +
  * member count) lives in the streaming state store across micro-batches via
  * `flatMapGroupsWithState`.
  *
  * Assignment semantics are FIRST-WINS: the first batch that sees a key
  * elects the smallest mention id in that batch as the cluster's canonical
  * id; every later arrival attaches to the existing canonical even if its own
  * id is smaller. That is exactly what an always-on ER ingest needs — cluster
  * identity must be stable once handed downstream, so it cannot be
  * re-elected when a smaller id arrives later (the batch pipeline, which
  * sees all data at once, uses global-min canonicals instead).
  *
  * Within a batch the group's rows are sorted before processing, so output
  * is deterministic at any shuffle partitioning.
  *
  * At scale this is the standard streaming-state layout: state is
  * hash-partitioned by blocking key across executors (the same partitioning
  * the batch blocking join uses), each key's state is O(1), and skew is
  * bounded because a hot key still keeps only one small state record.
  */
object StreamingLink {

  /** Per-key cluster state carried across micro-batches. */
  final case class KeyState(canonicalId: Long, nMembers: Long)

  /** One output row per arriving mention. */
  final case class Assignment(
      blockingKey: String,
      mentionId: Long,
      canonicalId: Long,
      isNewCluster: Boolean,
      nMembersAfter: Long)

  /** Incremental canonical assignment over a (possibly streaming) dataset of
    * (blockingKey, mentionId). Works identically on batch datasets (Spark
    * runs the state machine once per group). */
  def assignCanonical(mentions: Dataset[(String, Long)]): Dataset[Assignment] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[Assignment]
    mentions
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[KeyState, Assignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[KeyState]) =>
          val ids = rows.map(_._2).toArray.sorted
          val out = Vector.newBuilder[Assignment]
          var st = state.getOption
          ids.foreach { id =>
            st match {
              case Some(s) =>
                val next = KeyState(s.canonicalId, s.nMembers + 1)
                out += Assignment(key, id, s.canonicalId, isNewCluster = false, next.nMembers)
                st = Some(next)
              case None =>
                val next = KeyState(id, 1L)
                out += Assignment(key, id, id, isNewCluster = true, 1L)
                st = Some(next)
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
