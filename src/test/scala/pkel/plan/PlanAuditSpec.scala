package pkel.plan

import pkel.SparkSpec
import pkel.ontology.Ontology

/** Physical-plan audits: the plans the engine promises (SURVEY.md §4) are the
  * plans Catalyst actually produces — filters reach the parquet scan, small
  * dims broadcast, rank-limits push into windows, and the pair kernel
  * pipelines on the bucket join without an intervening exchange.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val exec = df.queryExecution
    exec.executedPlan.toString + "\n" + exec.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("agg pushdown: filter and column pruning reach the parquet scan") {
    val plan = planOf(graft.Queries.aggPushdown(spark, sfDir))
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(l_quantity,10.0)"),
      s"filter not pushed:\n${plan.take(2000)}")
    assert(!plan.contains("l_shipdate"), "unneeded column not pruned from scan")
  }

  test("dim joins broadcast: no shuffle of the fact side") {
    val plan = planOf(graft.Queries.joinBroadcast(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n${plan.take(2000)}")
  }

  test("window top-k gets a group-limit pushdown") {
    val plan = planOf(graft.Queries.windowTopK(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), s"rank limit not pushed into window:\n${plan.take(2000)}")
  }

  test("exact linker joins the broadcast ontology index") {
    val entries = Ontology.load()
    val index = Ontology.blockingIndex(entries)
    import spark.implicits._
    val mentions = Seq((1L, "the AUC was high", "Q88", 4, 7, false))
      .toDF("mention_id", "text", "label", "span_start", "span_end", "is_table")
    val keyed = pkel.link.ExactLinker.withBlockingKey(mentions)
    val plan = planOf(pkel.link.ExactLinker.link(spark, keyed, index))
    assert(plan.contains("BroadcastHashJoin"), s"index join must broadcast:\n${plan.take(2000)}")
  }

  test("fused pair scoring: the kernel pipelines on the bucket join output") {
    import spark.implicits._
    val keyed = (1L to 100L).map(i => (i, "cl", Seq("cl"), s"m$i"))
      .toDF("mention_id", "blocking_key", "tokens", "mention")
    val pairs = pkel.blocking.PairGen.blockingKeyPairs(keyed, pkel.blocking.PairGen.Config())
    val scored = pkel.scoring.PairScorer.scorePairs(pairs)
    val plan = scored.queryExecution.executedPlan.toString
    // the scorer (SerializeFromObject/MapPartitions) must sit directly above
    // the join subtree with no Exchange between them
    val lines = plan.linesIterator.toSeq
    val mapIdx = lines.indexWhere(_.contains("MapPartitions"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(mapIdx >= 0 && joinIdx > mapIdx, s"unexpected plan shape:\n$plan")
    val between = lines.slice(mapIdx, joinIdx)
    assert(!between.exists(_.contains("Exchange")),
      s"exchange between scorer and pair join:\n${between.mkString("\n")}")
  }

  test("whole-stage codegen spans cover the relational battery") {
    // AQE finalizes the plan only on execution — run the query first
    val df = graft.Queries.aggPushdown(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the finalized tree
    assert(finalPlan.contains("*("), s"expected codegen stages:\n$finalPlan")
  }
}
