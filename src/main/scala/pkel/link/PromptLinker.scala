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
