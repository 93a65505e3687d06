package pkel.link

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import pkel.model.OntologyEntry
import pkel.ontology.Ontology

/** Tier 5: prompt/LLM linker — the external-call Spark seam.
  *
  * Behavioral port of `/root/reference/pk_el/linkers/prompt_linker.py`:
  * prompt assembly (`gen_prompt`, :199-229), answer→id grounding with NIL
  * fallback (:171-183 — "nil"/"n/a"/"none" → Q100, a recognized parameter
  * name → its id, anything unrecognized → grounding failure → Q100 flagged
  * `no_answer`, `link_mentions_with_llm` :296-302), and the union semantics
  * of `merge_llm_and_unmatched_results` (:224-229) via the cascade's tier
  * merge.
  *
  * The generative model is a pluggable `PromptScorer` executed inside a
  * `mapPartitions` stage — the right seam for an external endpoint at scale:
  * one client per partition, residue rows streamed through it, no shuffle.
  * No model ships offline; tests plug a deterministic fake.
  */
object PromptLinker {

  /** External completion endpoint: (system prompt, user prompt) → response.
    * Instantiated once per partition inside the kernel. */
  trait PromptScorer extends Serializable {
    def complete(systemPrompt: String, userPrompt: String): String
  }

  /** Port of SYSTEM_PROMPT_STANDARD (`prompt_linker.py:35-47`), with the
    * PK-specific framing kept so a swapped-in real model reproduces the
    * reference's behavior. */
  val SystemPromptStandard: String =
    """You are a highly intelligent and accurate pharmacokinetics (PK) entity linker.
      |You will receive a parameter mention from scientific literature and an ontology.
      |Your task is to accurately identify the mention using the concepts in the given ontology.
      |
      |- Accuracy is paramount. If the text does not precisely refer to any of the concepts listed below, please answer NIL.
      |- If the mention does not refer to a PK parameter, please answer NIL.
      |- If you are unsure, please answer NIL.
      |- If there is a match, please answer with the corresponding concept name (PARAM_NAME), exactly as it appears in the ontology below.
      |
      |Please return your answer in the format: {param: <answer>}.""".stripMargin

  /** Port of SYSTEM_PROMPT_COT (`prompt_linker.py:10-33`): the
    * chain-of-thought variant swept by `tune_prompt_linker.py` via
    * `--use_cot_prompt`. */
  val SystemPromptCot: String =
    """You are a highly intelligent and accurate pharmacokinetics (PK) entity linker.
      |You will receive a parameter mention from scientific literature and an ontology.
      |Your task is to accurately identify the mention using the concepts in the ontology.
      |
      |Please answer the following questions to determine the output:
      |
      |Q1. Does the mention refer to a PK parameter?
      |This excludes the following: pharmacodynamic, PBPK, chemical, in vitro, or clinical concepts.
      |- If yes, go to Q2.
      |- If no, set the final answer to NIL.
      |- If you are unsure, set the final answer to NIL.
      |
      |Q2. Does the mention match or refer to a known PK concept in the ontology?
      |Note mentions may include prefixes, suffixes, time annotations, or drug-specific subscripts.
      |Map these to their core ontology concept if applicable.
      |- If yes, return the concept name exactly as it appears in the ontology.
      |- If no, set the final answer to NIL.
      |- If you are unsure, set the final answer to NIL.
      |
      |Please return only the final answer in the format: {param: final answer}.""".stripMargin

  /** Port of SENTENCE_EXAMPLES (`prompt_linker.py:51-97`): the sentence-mode
    * few-shot block injected by `--use_examples`. Vendored prompt DATA (like
    * the drug lexicon), not code. */
  val SentenceExamples: String =
    """The following examples are provided to guide you. They include mentions (with context if relevant), expected answers and explanations:
      |
      |[Mention] plasma concentration (or its ratio)
      |[Expected Output] {param: NIL}
      |[Explanation] Non-specific or ratio-based references to concentration without a specific PK parameter should link to NIL.
      |
      |[Mention] Maximum concentration at steady-state (Css (max))
      |[Expected Output] {param: NIL}
      |[Explanation] This is a mixture of parameters in our ontology (Css, Cmax) and does not fit exactly with any one so should be marked as NIL.
      |
      |[Mention] Rate constant for distribution to the effector compartment
      |[Expected Output] {param: NIL}
      |[Explanation] Although it refers to a rate constant, it is related to the effect compartment, not specifically covered in our ontology.
      |
      |[Mention] half-lives[/MENTION] were 1.39 hours and 1.89 hours for R-BSO and S-BSO, respectively.
      |[Expected Output] {param: t1/2z}
      |[Explanation]: Unqualified or overall half-lives default to t1/2z.
      |
      |[Mentions] A pharmacokinetic model with two compartments described the [MENTION]elimination half-lives[/MENTION] of cefepime as 1.65 h in foals and 1.09 h in dogs.
      |The [MENTION]half-life of the later phase[/MENTION] was 323 minutes in healthy individuals, with comparable values in cholestasis and biliary obstruction groups.
      |[Expected Outputs in both cases] {param: t1/2β}
      |[Explanation]: Later phase-specific half-lives should map to t1/2β. Remember in the context of a 2-compartment model, terminal/elimination t1/2 refer to t1/2β and in a three-compartment model these refer to t1/2γ.
      |
      |[Mention] The [MENTION]half-life of the fast distribution phase[/MENTION] was estimated.
      |[Expected Output] {param: t1/2α}
      |[Explanation] Early phase-specific half-lives should map to t1/2α.
      |
      |[Mentions] dialytic clearance, CL(uptake), clearance from the perfusate (CL) and into the bile (CLB)
      |[Expected Output in all cases] {param: NIL}
      |[Explanation] These refer to specific subtypes of clearance (e.g., dialysis, uptake, biliary) and not to CL parameters in our ontology.
      |
      |[Mention] renal excretion rate (1.69 microg x min(-1))
      |[Expected Output] {param: NIL}
      |[Explanation] We are not interested in rates, only rate constants, link to NIL. Remember, the units can give clues e.g. this is not kexcr which has units of 1/time.
      |
      |[Mention] unbound renal clearance
      |[Expected Output] {param: CLu}
      |[Explanation] Refers to clearance of the unbound fraction of drug, links to CLu.
      |
      |[Mention] AUC12 hours
      |[Expected Output] {param: AUCt}
      |[Explanation] The mention refers to area under the curve over a fixed time window (0-12h), matching AUCt.""".stripMargin

  /** Port of TABLE_EXAMPLES (`prompt_linker.py:100-135`): the table-mode
    * few-shot block — the tuning script pairs it with table mentions. */
  val TableExamples: String =
    """The following examples are provided to guide you. They include mentions (with context if relevant), expected answers and explanations:
      |
      |[Mention] Vd,ss/F (mL/kg)
      |[Expected Output] {param: NIL}
      |[Explanation] This does not fit exactly with any a parameter in the ontology (closest to V/F but at steady-state) -> return NIL.
      |
      |[Mention] Cmax at steady-state
      |[Expected Output] {param: NIL}
      |[Explanation] This does not fit exactly with any a parameter in the ontology (closest to Cmax but at steady-state) -> return NIL.
      |
      |[Mention] ARCtrough
      |[FOOTER] ARCtrough = Accumulation ratio of trough concentrations
      |[Expected Output] {param: NIL}
      |[Explanation] Does not link specifically to any entries in the ontology -> return NIL.
      |
      |[Mention] Cavg0–336h
      |[Expected Output] {param: Cavg}
      |[Explanation] Average concentration even over a defined interval, should link to Cavg.
      |
      |[Mention] CL0–t  hour,secretion (mL/min)d
      |[FOOTER] CL, clearance; Cmax, maximum plasma concentration.
      |[Expected Output] {param: CL}
      |[Explanation]  Clearance, even over a defined interval, should link to CL.
      |
      |[Mentions] AUC0–∞/D, AUC0–∞, norm
      |[Expected Output in both cases] {param: AUC/dose}
      |[Explanation] Even though "AUC0–∞" would normally link to AUC∞, both mentions are dose-normalized, so must link to AUC/dose.
      |
      |[Mention] CLM,NR (L/hr)
      |[FOOTER] CL, clearance; M3G, morphine‐3‐glucuronide.
      |[Expected Output] {param: CLNR}
      |[Explanation] "NR" represent non-renal in this case and so is critical for linking.
      |
      |[Mention] VM
      |[FOOTER] Definitions: VM = Central volume of distribution of morphine (M).
      |[Expected Output] {param: V1}
      |[Explanation] The footer shows that M refers to the drug name and should be ignored for linking.""".stripMargin

  /** One cell of the reference's prompt-ablation grid
    * (`tune_prompt_linker.py:36-44`: `use_cot_prompt` × `use_examples` ×
    * `use_context`). `isTable` selects WHICH few-shot block `useExamples`
    * injects — TABLE_EXAMPLES for table mentions, SENTENCE_EXAMPLES for
    * sentence mentions, the tuning script's pairing. */
  final case class Variant(useCotPrompt: Boolean = false, useExamples: Boolean = false,
      useContext: Boolean = false, isTable: Boolean = false) {
    def systemPrompt: String = if (useCotPrompt) SystemPromptCot else SystemPromptStandard
    def examples: Option[String] =
      if (useExamples) Some(if (isTable) TableExamples else SentenceExamples) else None
    def name: String = Seq(
      if (useCotPrompt) "cot" else "std",
      if (useExamples) { if (isTable) "tabex" else "sentex" } else "zeroshot",
      if (useContext) "ctx" else "noctx").mkString("+")
  }

  /** The full 8-cell ablation grid for one mention mode. */
  def variantGrid(isTable: Boolean = false): Seq[Variant] =
    for (cot <- Seq(false, true); ex <- Seq(false, true); ctx <- Seq(false, true))
      yield Variant(cot, ex, ctx, isTable)

  /** User-prompt assembly mirroring `gen_prompt` (`prompt_linker.py:199-229`). */
  def genUserPrompt(mention: String, kbConcepts: String,
      context: Option[String] = None, examples: Option[String] = None): String = {
    val sb = new StringBuilder
    sb.append(s"\n---\nMention:\n$mention\n---\n")
    context.foreach(c => sb.append(s"\n---\nContext:\n$c\n---\n"))
    examples.foreach(e => sb.append(s"\n---\nTask Examples:\n$e\n---\n"))
    sb.append(s"\n---\nOntology:\n\n$kbConcepts\n---\n")
    sb.result().trim
  }

  /** Answer→id grounding (`prompt_linker.py:171-183`): strip the
    * `{param: ...}` wrapper exactly as the reference does (brace strip, then
    * whitespace strip, then lowercase), accept NIL spellings, then look the
    * answer up among lowercased parameter names. None = grounding failure. */
  def ground(response: String, paramToIdLower: Map[String, String]): Option[String] = {
    if (response == null) return None
    val noTag = response.replace("param:", "")
    val noBraces = {
      val s1 = noTag.dropWhile(c => c == '{' || c == '}')
      s1.reverse.dropWhile(c => c == '{' || c == '}').reverse
    }
    val answer = noBraces.trim.toLowerCase
    if (answer == "nil" || answer == "n/a" || answer == "none") Some("Q100")
    else paramToIdLower.get(answer)
  }

  /** Lowercased parameter-name → id map (`param_to_id` with lowered keys,
    * `prompt_linker.py:174`). */
  def paramToIdLower(entries: Seq[OntologyEntry]): Map[String, String] =
    entries.iterator.map(e => e.parameterName.toLowerCase.trim -> e.parameterId).toMap

  /** Run the prompt tier over residue mentions.
    *
    * Input columns: `featureCol` (the mention text shown to the model;
    * reference default `mention`), optional `subsetted_concepts` (category
    * blocking output — when present and non-empty the prompt carries only
    * the subset ontology block, `evaluate_prompt_linker.py` wiring; when
    * absent/empty the full ontology block is used).
    * Output: residue columns + (y_pred, score, status, tier) where status ∈
    * linked | nil | no_answer (the reference's three answer outcomes). */
  def link(spark: SparkSession, residue: DataFrame, entries: Seq[OntologyEntry],
      scorer: PromptScorer, featureCol: String = "mention",
      systemPrompt: String = SystemPromptStandard,
      examples: Option[String] = None, contextCol: Option[String] = None): DataFrame = {
    val outSchema = StructType(residue.schema.fields.toSeq ++ Seq(
      StructField("y_pred", StringType),
      StructField("score", DoubleType),
      StructField("status", StringType),
      StructField("tier", StringType)))
    val featIdx = residue.schema.fieldIndex(featureCol)
    val subsetIdx =
      if (residue.schema.fieldNames.contains("subsetted_concepts"))
        residue.schema.fieldIndex("subsetted_concepts")
      else -1
    val ctxIdx = contextCol.map(residue.schema.fieldIndex).getOrElse(-1)
    val nameToId = paramToIdLower(entries)
    val fullBlock = Ontology.formatForLlm(entries)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)

    residue.mapPartitions { rows =>
      // subset sets repeat massively across mentions — format each once
      val blockMemo = new java.util.HashMap[String, String]()
      def kbBlock(subset: Seq[String]): String =
        if (subset == null || subset.isEmpty) fullBlock
        else {
          val key = subset.sorted.mkString(",")
          var b = blockMemo.get(key)
          if (b == null) {
            b = Ontology.formatForLlm(entries.filter(e => subset.contains(e.parameterId)))
            blockMemo.put(key, b)
          }
          b
        }
      rows.map { row =>
        val mention = if (row.isNullAt(featIdx)) "" else row.getString(featIdx)
        val subset =
          if (subsetIdx >= 0 && !row.isNullAt(subsetIdx)) row.getSeq[String](subsetIdx)
          else null
        val context =
          if (ctxIdx >= 0 && !row.isNullAt(ctxIdx)) Some(row.getString(ctxIdx)) else None
        val user = genUserPrompt(mention, kbBlock(subset), context, examples)
        val response = scorer.complete(systemPrompt, user)
        val (yPred, status) = ground(response, nameToId) match {
          case Some("Q100") => ("Q100", "nil")
          case Some(id) => (id, "linked")
          case None => ("Q100", "no_answer") // unrecognized answer → NIL
        }
        val score = if (status == "linked") 100.0 else 0.0
        Row.fromSeq(row.toSeq ++ Seq(yPred, score, status, "prompt"))
      }
    }(encoder)
  }

  /** Run the prompt tier under one ablation-grid cell: the variant picks the
    * system prompt (standard|CoT), the few-shot block (zero-shot|mode-paired
    * examples), and whether the context column rides in the prompt. */
  def linkVariant(spark: SparkSession, residue: DataFrame, entries: Seq[OntologyEntry],
      scorer: PromptScorer, variant: Variant, featureCol: String = "mention",
      contextCol: String = "text"): DataFrame =
    link(spark, residue, entries, scorer, featureCol, variant.systemPrompt,
      variant.examples, if (variant.useContext) Some(contextCol) else None)

  /** The reference's prompt ablation (`tune_prompt_linker.py` sweeps one cell
    * per invocation; this runs the whole grid) with per-variant answer-outcome
    * counts AND the variant's token price from [[PromptCost]] — so each cell
    * shows its accuracy-relevant outcome mix next to what it would cost.
    * Returns one row per variant:
    * (variant, use_cot, use_examples, use_context, n, linked, nil, no_answer,
    *  total_prompt_tokens, total_cost_nanos). Variants only change constants
    * in the assembled prompt, so the grid costs |grid| passes over the
    * (small, residue-sized) input — each pass the same mapPartitions kernel
    * the single-variant tier runs. */
  def sweepVariants(spark: SparkSession, residue: DataFrame, entries: Seq[OntologyEntry],
      scorer: PromptScorer, variants: Seq[Variant], model: String = "gpt-4o-mini",
      featureCol: String = "mention", contextCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val perVariant = variants.map { v =>
      val linked = linkVariant(spark, residue, entries, scorer, v, featureCol, contextCol)
      val outcome = linked.groupBy()
        .agg(count(lit(1)).as("n"),
          sum(when(col("status") === "linked", 1L).otherwise(0L)).as("linked"),
          sum(when(col("status") === "nil", 1L).otherwise(0L)).as("nil"),
          sum(when(col("status") === "no_answer", 1L).otherwise(0L)).as("no_answer"))
      val cost = PromptCost.estimateVariant(spark, residue, entries, model, v,
        featureCol, contextCol)
        .select(col("total_prompt_tokens"), col("total_cost_nanos"))
      outcome.crossJoin(cost) // both sides are single summary rows
        .select(lit(v.name).as("variant"),
          lit(v.useCotPrompt).as("use_cot"), lit(v.useExamples).as("use_examples"),
          lit(v.useContext).as("use_context"),
          col("n"), col("linked"), col("nil"), col("no_answer"),
          col("total_prompt_tokens"), col("total_cost_nanos"))
    }
    perVariant.reduce(_ unionByName _).orderBy("variant")
  }

  /** Entry-order-preserving lookup helper for tests. */
  def entryFor(entries: Seq[OntologyEntry], id: String): Option[OntologyEntry] =
    entries.find(_.parameterId == id)

  /** Deterministic offline stand-in model: answers with the name of the
    * first ontology entry whose name or synonym occurs (case-insensitive)
    * in the prompt's mention line, else NIL. Exercises both grounding
    * outcomes end-to-end with zero external calls — the shape a real model
    * plugs into. */
  final class SubstringScorer(entries: Seq[OntologyEntry]) extends PromptScorer {
    private val surfaces: Seq[(String, String)] = entries.flatMap { e =>
      (e.parameterName +: e.parameterSynonyms.filter(_.nonEmpty))
        .map(s => (s.toLowerCase, e.parameterName))
    }
    // Mention surfaces repeat massively across residue rows (a bounded
    // vocabulary of ontology variants + typos + decoys), so the linear
    // surface scan runs once per DISTINCT mention, not once per row — same
    // answers, a fraction of the round-2 cost (this fake was the single
    // largest battery line item). @transient: the memo restarts empty in
    // each deserialized task instance instead of shipping with the closure.
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    private def scan(mention: String): String =
      surfaces.collectFirst { case (s, name) if mention.contains(s) => s"{param: $name}" }
        .getOrElse("{param: NIL}")
    def complete(systemPrompt: String, userPrompt: String): String = {
      // indexOf extraction of the Mention block: the previous regex scanned
      // the full multi-KB prompt (ontology block included) on every row
      val start = userPrompt.indexOf("Mention:\n")
      val mention =
        if (start < 0) ""
        else {
          val from = start + 9
          val end = userPrompt.indexOf("\n---", from)
          if (end < 0) "" else userPrompt.substring(from, end).toLowerCase
        }
      memo.computeIfAbsent(mention, m => scan(m))
    }
  }
}
