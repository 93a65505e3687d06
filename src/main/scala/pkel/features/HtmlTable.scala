package pkel.features

import java.util.regex.Pattern

/** Regex-based HTML `<table>` parsing for table-cell mention context.
  *
  * Behavioral port of `parse_html_table` / `extract_context_from_table`
  * (`/root/reference/pk_el/data_preprocessing.py:35-128`): rows of stripped
  * cell texts, leading 0,1,2,… index row/column removed, ±3-cell row/column
  * context with the target cell replaced by the tagged mention. Well-formed
  * fixture HTML only; no external HTML parser needed.
  */
object HtmlTable {

  private val TrRe = Pattern.compile("(?is)<tr[^>]*>(.*?)</tr>")
  private val CellRe = Pattern.compile("(?is)<t[dh][^>]*>(.*?)</t[dh]>")
  private val TagRe = Pattern.compile("(?s)<[^>]+>")

  private def stripTags(s: String): String =
    TagRe.matcher(s).replaceAll("").replace("&amp;", "&").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&nbsp;", " ").trim

  /** Is this a 0-based increasing integer sequence (optionally after a blank
    * leading corner)? (`is_index_sequence`, `:35-41`). */
  def isIndexSequence(values: Seq[String], allowLeadingBlank: Boolean = false): Boolean = {
    val vs = if (allowLeadingBlank && values.nonEmpty && values.head.trim.isEmpty) values.tail else values
    if (vs.isEmpty) return false
    vs.forall(v => v.nonEmpty && v.forall(_.isDigit)) &&
      vs.map(_.toInt) == vs.indices.map(identity)
  }

  /** Parse to rows of cell texts, index row/col stripped. */
  def parse(html: String): Seq[Seq[String]] = {
    if (html == null || html.isEmpty) return Seq.empty
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val trm = TrRe.matcher(html)
    while (trm.find()) {
      val cells = scala.collection.mutable.ArrayBuffer.empty[String]
      val cm = CellRe.matcher(trm.group(1))
      while (cm.find()) cells += stripTags(cm.group(1))
      rows += cells.toSeq
    }
    if (rows.isEmpty) return Seq.empty
    var parsed: Seq[Seq[String]] = rows.toSeq
    if (isIndexSequence(parsed.head, allowLeadingBlank = true)) parsed = parsed.tail
    val firstCol = parsed.collect { case r if r.nonEmpty => r.head }
    if (isIndexSequence(firstCol)) parsed = parsed.map(r => if (r.nonEmpty) r.tail else r)
    parsed
  }

  /** Row + column context (±`window` cells) with the target replaced by the
    * tagged mention (`extract_context_from_table`, `:83-128`). */
  def context(table: Seq[Seq[String]], tagged: String, rowIdx: Int, colIdx: Int,
      window: Int = 3): (String, String) = {
    val totalRows = table.length
    val row = if (rowIdx >= 0 && rowIdx < totalRows) table(rowIdx) else Seq.empty
    val rowCtx = ((math.max(0, colIdx - window)) until (colIdx + window + 1)).flatMap { i =>
      if (i < row.length) Some(if (i == colIdx) tagged else row(i)) else None
    }
    val colCtx = ((math.max(0, rowIdx - window)) until (rowIdx + window + 1)).flatMap { i =>
      if (i < totalRows && colIdx >= 0 && colIdx < table(i).length)
        Some(if (i == rowIdx) tagged else table(i)(colIdx))
      else None
    }
    val rowStr = if (rowCtx.nonEmpty) "| " + rowCtx.mkString(" | ") + " |" else ""
    val colStr = if (colCtx.nonEmpty) "| " + colCtx.mkString(" | ") + " |" else ""
    (rowStr, colStr)
  }

  /** Post-strip (row_idx, col_idx) of the cell whose body contains char
    * offset `pos` of the raw html — the extractor's bridge from a «»-span
    * offset to [[parse]] coordinates. Applies the same index-row/column
    * stripping as `parse`, so the result indexes directly into its output;
    * (-1, -1) when `pos` falls outside every cell body or inside a stripped
    * index row/column. */
  def coords(html: String, pos: Int): (Int, Int) = {
    if (html == null || html.isEmpty || pos < 0) return (-1, -1)
    val cellTexts = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var hit = (-1, -1)
    val trm = TrRe.matcher(html)
    var r = 0
    while (trm.find()) {
      val rowStart = trm.start(1)
      val cm = CellRe.matcher(trm.group(1))
      val cells = scala.collection.mutable.ArrayBuffer.empty[String]
      var c = 0
      while (cm.find()) {
        if (pos >= rowStart + cm.start(1) && pos < rowStart + cm.end(1)) hit = (r, c)
        cells += stripTags(cm.group(1))
        c += 1
      }
      cellTexts += cells.toSeq
      r += 1
    }
    if (hit == (-1, -1)) return (-1, -1)
    var (hr, hc) = hit
    var rows: Seq[Seq[String]] = cellTexts.toSeq
    if (isIndexSequence(rows.head, allowLeadingBlank = true)) {
      if (hr == 0) return (-1, -1)
      hr -= 1
      rows = rows.tail
    }
    val firstCol = rows.collect { case row if row.nonEmpty => row.head }
    if (isIndexSequence(firstCol)) {
      if (hc == 0) return (-1, -1)
      hc -= 1
    }
    (hr, hc)
  }

  /** `format_table_context_for_retrieval` (`:346-370`): tagged mention +
    * [ROW]/[COLUMN] context lines. */
  def retrievalContext(html: String, tagged: String, rowIdx: Int, colIdx: Int): String = {
    val parsed = parse(html)
    val (rowCtx, colCtx) = context(parsed, tagged, rowIdx, colIdx)
    val parts = Seq.newBuilder[String]
    parts += tagged
    if (rowCtx.nonEmpty) parts += s"[ROW] ${rowCtx.trim}"
    if (colCtx.nonEmpty) parts += s"[COLUMN] ${colCtx.trim}"
    parts.result().mkString("\n")
  }
}
