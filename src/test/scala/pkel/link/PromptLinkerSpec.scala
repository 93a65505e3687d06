package pkel.link

import org.apache.spark.sql.functions._

import pkel.SparkSpec
import pkel.io.MentionReader
import pkel.ontology.Ontology

/** Tier-5 prompt-linker seam with deterministic offline fakes: grounding,
  * prompt assembly, subset-constrained ontology blocks, and the cascade's
  * tier merge over the bi-encoder residue. */
class PromptLinkerSpec extends SparkSpec {

  lazy val entries = Ontology.load()
  lazy val nameToId = PromptLinker.paramToIdLower(entries)

  test("grounding mirrors the reference answer parsing") {
    // {param: X} wrapper, case-insensitive name lookup
    val someName = entries.head.parameterName
    assert(PromptLinker.ground(s"{param: $someName}", nameToId)
      .contains(entries.head.parameterId))
    assert(PromptLinker.ground(s"{param: ${someName.toUpperCase}}", nameToId)
      .contains(entries.head.parameterId))
    // NIL spellings → Q100
    assert(PromptLinker.ground("{param: NIL}", nameToId).contains("Q100"))
    assert(PromptLinker.ground("n/a", nameToId).contains("Q100"))
    assert(PromptLinker.ground("{param: none}", nameToId).contains("Q100"))
    // unrecognized → grounding failure (None), reference prints + NILs
    assert(PromptLinker.ground("{param: flux capacitance}", nameToId).isEmpty)
    assert(PromptLinker.ground(null, nameToId).isEmpty)
    // every ontology entry's name grounds back to its own id
    entries.foreach { e =>
      assert(PromptLinker.ground(s"{param: ${e.parameterName}}", nameToId)
        .contains(e.parameterId), s"failed to ground ${e.parameterName}")
    }
  }

  test("user prompt carries mention, optional context/examples, and the ontology block") {
    val p = PromptLinker.genUserPrompt("AUC0-24", "KB_BLOCK",
      context = Some("row context"), examples = Some("EX"))
    assert(p.contains("Mention:\nAUC0-24"))
    assert(p.contains("Context:\nrow context"))
    assert(p.contains("Task Examples:\nEX"))
    assert(p.indexOf("Ontology:") > p.indexOf("Mention:"))
    assert(p.contains("KB_BLOCK"))
    val noCtx = PromptLinker.genUserPrompt("m", "kb")
    assert(!noCtx.contains("Context:") && !noCtx.contains("Task Examples:"))
  }

  test("link: grounding outcomes and subset-constrained ontology block") {
    import spark.implicits._
    val subsetIds = entries.slice(5, 8).map(_.parameterId)
    val residue = Seq(
      (1L, "Q57", "k1", "mention one", Some(subsetIds)),
      (2L, "Q1", "k2", "mention two", None: Option[Seq[String]]))
      .toDF("mention_id", "label", "blocking_key", "mention", "subsetted_concepts")
    val out = PromptLinker.link(spark, residue, entries, new FirstParamScorer).collect()
      .map(r => r.getAs[Long]("mention_id") ->
        (r.getAs[String]("y_pred"), r.getAs[String]("status"))).toMap
    // subsetted mention → first param OF THE SUBSET; unsubsetted → first of full ontology
    assert(out(1L) == (entries(5).parameterId, "linked"), s"got ${out(1L)}")
    assert(out(2L) == (entries.head.parameterId, "linked"))
  }

  test("link: NIL answer and grounding failure produce distinct statuses") {
    import spark.implicits._
    val residue = Seq(
      (1L, "Q57", "k", "say nil"),
      (2L, "Q57", "k", "say junk"))
      .toDF("mention_id", "label", "blocking_key", "mention")
    val scorer = new NilOrJunkScorer
    val out = PromptLinker.link(spark, residue, entries, scorer).collect()
      .map(r => r.getAs[Long]("mention_id") ->
        (r.getAs[String]("y_pred"), r.getAs[String]("status"))).toMap
    assert(out(1L) == ("Q100", "nil"))
    assert(out(2L) == ("Q100", "no_answer"))
  }

  test("cascade tier 5 consumes exactly the bi-encoder's unlinked residue") {
    val mentions = MentionReader.readJsonl(spark,
      resourcePath("/pkel/data/sentences/test.jsonl"), isTable = false)
    val base = Cascade.run(spark, mentions, entries).cache()
    val baseUnlinked = base.filter(col("tier") === "biencoder" && col("status") === "unlinked").count()
    val baseLinkedBienc = base.filter(col("tier") === "biencoder" && col("status") === "linked").count()

    // deterministic fake: everything the earlier tiers could not link is NIL
    val nilScorer = new AlwaysNilScorer
    val withTier5 = Cascade.run(spark, mentions, entries,
      Cascade.Config(promptScorer = Some(nilScorer))).cache()
    assert(withTier5.count() == base.count(), "tier merge must keep one row per mention")
    val prompted = withTier5.filter(col("tier") === "prompt")
    assert(prompted.count() == baseUnlinked,
      s"prompt tier must see exactly the unlinked residue ($baseUnlinked)")
    assert(prompted.filter(col("status") === "nil" && col("y_pred") === "Q100").count() == baseUnlinked)
    assert(withTier5.filter(col("tier") === "biencoder").count() == baseLinkedBienc,
      "linked bi-encoder rows pass through unchanged")
  }
}

// Fakes live top-level: an inner class would capture the (non-serializable)
// suite and fail closure cleaning on executors.

/** Answers with the first PARAM_NAME present in the prompt's ontology block —
  * exercises subset-constrained block assembly without a real model. */
private class FirstParamScorer extends PromptLinker.PromptScorer {
  def complete(systemPrompt: String, userPrompt: String): String = {
    val m = "\\[PARAM_NAME\\] (.+)".r.findFirstMatchIn(userPrompt)
    m.map(g => s"{param: ${g.group(1).trim}}").getOrElse("garbage")
  }
}

private class NilOrJunkScorer extends PromptLinker.PromptScorer {
  def complete(sys: String, user: String): String =
    if (user.contains("say nil")) "{param: NIL}" else "{param: not-a-parameter}"
}

private class AlwaysNilScorer extends PromptLinker.PromptScorer {
  def complete(sys: String, user: String): String = "{param: NIL}"
}
