package pkel.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import pkel.model.OntologyEntry
import pkel.ontology.Ontology

/** Prompt-tier token & cost accounting — behavioral port of
  * `estimate_average_tokens_and_cost`
  * (`/root/reference/pk_el/linkers/prompt_linker.py:415-496`): per-example
  * prompt-token count over the assembled (system + user) prompt, a fixed
  * price table, an estimated completion-token constant, and run-level
  * aggregates (total/average tokens, cost per example / per 1000 / total).
  *
  * Offline stand-ins, both declared seams:
  *  - tiktoken → a deterministic regex token count (`TokenPattern`): letter
  *    runs, single digits, single non-alnum non-space codepoints. RE2-safe,
  *    so the DuckDB oracle runs the IDENTICAL count.
  *  - dollars → integer NANODOLLARS. Every reference rate is an exact
  *    integer in nanodollars/token (rate$/1k ÷ 1000 × 1e9), so all cost
  *    arithmetic is BIGINT-exact on both engines — no float drift.
  *
  * Token additivity: the user prompt embeds the mention between newlines and
  * no token class crosses whitespace, so tokens(prompt(mention)) =
  * tokens(prompt("")) + tokens(mention). The per-run estimate therefore
  * computes one base constant driver-side (bounded by the ontology block, not
  * the data) and a codegen'd `regexp_extract_all` count per mention — no UDF,
  * no per-row prompt assembly on the data path.
  */
object PromptCost {

  /** ($ per 1k prompt tokens, $ per 1k completion tokens) —
    * `prompt_linker.py:421-428` (the reference comments them as per-1M but
    * divides by 1000; the division is the behavior, so it is what's ported). */
  val Prices: Map[String, (Double, Double)] = Map(
    "gpt-4o" -> (0.0025, 0.01),
    "gpt-4o-mini" -> (0.00015, 0.0006),
    "gpt-4.1" -> (0.002, 0.008),
    "gpt-4.1-mini" -> (0.0004, 0.0016),
    "gpt-4.1-nano" -> (0.0001, 0.0004))

  /** Integer nanodollars per single token. */
  def ratesNanos(model: String): (Long, Long) = {
    val (p, c) = Prices.getOrElse(model,
      throw new IllegalArgumentException(s"Unsupported model: $model"))
    (math.round(p / 1000.0 * 1e9), math.round(c / 1000.0 * 1e9))
  }

  /** Offline tokenizer stand-in (shared literally with the DuckDB oracle). */
  val TokenPattern: String = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  private val TokenRe = java.util.regex.Pattern.compile(TokenPattern)

  def countTokens(s: String): Int = {
    if (s == null) return 0
    val m = TokenRe.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Prompt-token count of the full assembled prompt for one mention —
    * the reference's `len(encoding.encode(system + "\n" + user))`. */
  def promptTokens(mention: String, systemPrompt: String, kbBlock: String): Int =
    countTokens(systemPrompt + "\n" +
      PromptLinker.genUserPrompt(Option(mention).getOrElse(""), kbBlock))

  /** Token count of the prompt scaffolding alone (empty mention): the
    * additive base every mention's count builds on. */
  def baseTokens(systemPrompt: String, kbBlock: String): Int =
    promptTokens("", systemPrompt, kbBlock)

  /** Nanodollar cost of one example (`prompt_linker.py:462-464`):
    * prompt tokens at the prompt rate + estimated completion tokens at the
    * completion rate. */
  def exampleCostNanos(promptTokens: Long, model: String,
      estCompletionTokens: Int = 7): Long = {
    val (p, c) = ratesNanos(model)
    promptTokens * p + estCompletionTokens.toLong * c
  }

  /** Run-level estimate over a mention DataFrame (column `featureCol` is the
    * mention text shown to the model). Returns ONE summary row mirroring the
    * reference's result dict, in integer units:
    * (model, total_examples, total_prompt_tokens, avg_prompt_tokens_bp,
    *  est_completion_tokens, cost_per_example_nanos_avg,
    *  cost_per_1000_examples_nanos, total_cost_nanos).
    * The per-mention token count is `base + regexp_extract_all` — pure
    * codegen, one aggregate over the data. */
  def estimate(spark: SparkSession, mentions: DataFrame, entries: Seq[OntologyEntry],
      model: String, featureCol: String = "mention",
      systemPrompt: String = PromptLinker.SystemPromptStandard,
      estCompletionTokens: Int = 7): DataFrame = {
    val (pRate, cRate) = ratesNanos(model)
    val base = baseTokens(systemPrompt, Ontology.formatForLlm(entries))
    val toks = (lit(base.toLong) +
      size(regexp_extract_all(coalesce(col(featureCol), lit("")),
        lit(TokenPattern), lit(0))).cast("long")).as("prompt_tokens")
    mentions.select(toks)
      .agg(count(lit(1)).as("total_examples"),
        sum(col("prompt_tokens")).as("total_prompt_tokens"))
      .select(
        lit(model).as("model"),
        col("total_examples"),
        col("total_prompt_tokens"),
        floor(lit(10000) * col("total_prompt_tokens") / col("total_examples"))
          .cast("long").as("avg_prompt_tokens_bp"),
        lit(estCompletionTokens.toLong).as("est_completion_tokens"),
        floor((col("total_prompt_tokens") * pRate +
          col("total_examples") * (estCompletionTokens.toLong * cRate)) / col("total_examples"))
          .cast("long").as("cost_per_example_nanos_avg"),
        (col("total_prompt_tokens") * pRate +
          col("total_examples") * (estCompletionTokens.toLong * cRate)).as("total_cost_nanos"))
      .withColumn("cost_per_1000_examples_nanos",
        floor(lit(1000) * col("total_cost_nanos") / col("total_examples")).cast("long"))
  }
}
