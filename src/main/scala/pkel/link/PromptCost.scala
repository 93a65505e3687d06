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
  def promptTokens(mention: String, systemPrompt: String, kbBlock: String,
      context: Option[String] = None, examples: Option[String] = None): Int =
    countTokens(systemPrompt + "\n" +
      PromptLinker.genUserPrompt(Option(mention).getOrElse(""), kbBlock, context, examples))

  /** Token count of the prompt scaffolding alone (empty mention): the
    * additive base every mention's count builds on. */
  def baseTokens(systemPrompt: String, kbBlock: String): Int =
    promptTokens("", systemPrompt, kbBlock)

  /** Scaffolding token count for an ablation-grid cell: empty mention, the
    * variant's system prompt and few-shot block, and — when the variant
    * carries context — an EMPTY context so the context section's own
    * `---/Context:` scaffolding is in the base (the per-row context text
    * then adds on top, same additivity as the mention). */
  def baseTokensVariant(variant: PromptLinker.Variant, kbBlock: String): Int =
    promptTokens("", variant.systemPrompt, kbBlock,
      context = if (variant.useContext) Some("") else None,
      examples = variant.examples)

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
    val base = baseTokens(systemPrompt, Ontology.formatForLlm(entries))
    val toks = lit(base.toLong) + colTokens(featureCol)
    summarize(mentions, toks, model, estCompletionTokens)
  }

  /** Cost estimate for one prompt-ablation cell ([[PromptLinker.Variant]]):
    * base covers the variant's system prompt + few-shot block + section
    * scaffolding; each row adds its mention tokens and — for context
    * variants — its context-column tokens. Same codegen-only shape as
    * [[estimate]]: one `regexp_extract_all` count per text column, one
    * aggregate, no per-row prompt assembly. */
  def estimateVariant(spark: SparkSession, mentions: DataFrame, entries: Seq[OntologyEntry],
      model: String, variant: PromptLinker.Variant, featureCol: String = "mention",
      contextCol: String = "text", estCompletionTokens: Int = 7): DataFrame = {
    val base = baseTokensVariant(variant, Ontology.formatForLlm(entries))
    val toks =
      if (variant.useContext) lit(base.toLong) + colTokens(featureCol) + colTokens(contextCol)
      else lit(base.toLong) + colTokens(featureCol)
    summarize(mentions, toks, model, estCompletionTokens)
  }

  /** Codegen'd token count of a text column (the regex stand-in). */
  private def colTokens(c: String) =
    size(regexp_extract_all(coalesce(col(c), lit("")), lit(TokenPattern), lit(0))).cast("long")

  private def summarize(mentions: DataFrame, toks: org.apache.spark.sql.Column,
      model: String, estCompletionTokens: Int): DataFrame = {
    val (pRate, cRate) = ratesNanos(model)
    mentions.select(toks.as("prompt_tokens"))
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
