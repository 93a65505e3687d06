package pkel.model

/** Core typed row models of the engine (Dataset[T] surfaces). */

/** One ontology (knowledge-base) entry. NIL = Q100 / G100. */
final case class OntologyEntry(
    categoryId: String,
    parameterCategory: String,
    parameterId: String,
    parameterName: String,
    parameterSynonyms: Seq[String],
    parameterDescription: String,
    units: String)

/** A mention span inside a text. */
final case class Span(start: Int, end: Int, text: String, label: String)

/** A mention record: one labeled PK-parameter mention in a sentence or table
  * cell. `label` is the gold parameter id (NIL = "Q100"). */
final case class Mention(
    mentionId: Long,
    text: String,
    label: String,
    spanStart: Int,
    spanEnd: Int,
    isTable: Boolean,
    tableHtml: String = "",
    caption: String = "",
    footer: String = "",
    rowIdx: Int = -1,
    colIdx: Int = -1,
    row: Int = -1,
    col: Int = -1) {
  def mention: String = text.substring(spanStart, spanEnd)
}

/** Per-tier prediction for one mention. `status` distinguishes the four NIL
  * paths of the reference (SURVEY.md §7.5 item 7). */
final case class Prediction(
    mentionId: Long,
    yTrue: String,
    yPred: String,
    tier: String,
    status: String,
    score: Double)

/** One turn of a conversation transcript (graft input table,
  * BASELINE.json input_hint). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)
