package pkel.link

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.ontology.Ontology

/** Port of the reference's LLM cost estimator (`prompt_linker.py:415-496`):
  * token-count heuristic + price table + per-run aggregates, pinned against
  * hand-computed totals on a fixture mention set. */
class PromptCostSpec extends SparkSpec {

  import spark.implicits._

  lazy val entries = Ontology.load()

  test("token-count stand-in: letter runs, single digits, single symbols") {
    assert(PromptCost.countTokens("AUC") == 1)
    assert(PromptCost.countTokens("AUC0-24") == 5) // AUC 0 - 2 4
    assert(PromptCost.countTokens("t1/2") == 4)
    assert(PromptCost.countTokens("AUC0-∞") == 4) // AUC 0 - ∞
    assert(PromptCost.countTokens("elimination half-life") == 4)
    assert(PromptCost.countTokens("") == 0)
    assert(PromptCost.countTokens(null) == 0)
    assert(PromptCost.countTokens("  \n\t ") == 0)
  }

  test("price table ports the reference rates as exact nanodollar integers") {
    assert(PromptCost.ratesNanos("gpt-4o") == ((2500L, 10000L)))
    assert(PromptCost.ratesNanos("gpt-4o-mini") == ((150L, 600L)))
    assert(PromptCost.ratesNanos("gpt-4.1") == ((2000L, 8000L)))
    assert(PromptCost.ratesNanos("gpt-4.1-mini") == ((400L, 1600L)))
    assert(PromptCost.ratesNanos("gpt-4.1-nano") == ((100L, 400L)))
    intercept[IllegalArgumentException](PromptCost.ratesNanos("gpt-5-imaginary"))
  }

  test("prompt tokens are additive in the mention (newline-delimited scaffold)") {
    val block = Ontology.formatForLlm(entries)
    val base = PromptCost.baseTokens(PromptLinker.SystemPromptStandard, block)
    assert(base > 100, s"ontology block should dominate the base count, got $base")
    Seq("AUC", "t1/2", "elimination half-life", "AUC0-∞ of caffeine").foreach { m =>
      assert(PromptCost.promptTokens(m, PromptLinker.SystemPromptStandard, block)
        == base + PromptCost.countTokens(m), s"non-additive for '$m'")
    }
  }

  test("run estimate matches hand-computed totals on a fixture set") {
    val block = Ontology.formatForLlm(entries)
    val base = PromptCost.baseTokens(PromptLinker.SystemPromptStandard, block).toLong
    val mentions = Seq("AUC", "t1/2").toDF("mention") // 1 + 4 mention tokens
    val r = PromptCost.estimate(spark, mentions, entries, "gpt-4o-mini").head()

    val tpt = 2 * base + 5
    val totalNanos = tpt * 150L + 2L * 7L * 600L
    assert(r.getAs[String]("model") == "gpt-4o-mini")
    assert(r.getAs[Long]("total_examples") == 2L)
    assert(r.getAs[Long]("total_prompt_tokens") == tpt)
    assert(r.getAs[Long]("avg_prompt_tokens_bp") == math.floorDiv(10000L * tpt, 2L))
    assert(r.getAs[Long]("est_completion_tokens") == 7L)
    assert(r.getAs[Long]("total_cost_nanos") == totalNanos)
    assert(r.getAs[Long]("cost_per_example_nanos_avg") == totalNanos / 2)
    assert(r.getAs[Long]("cost_per_1000_examples_nanos") == math.floorDiv(1000L * totalNanos, 2L))
    // example-level helper agrees with the reference's per-example formula
    assert(PromptCost.exampleCostNanos(base + 1, "gpt-4o-mini") == (base + 1) * 150L + 7L * 600L)
  }
}
