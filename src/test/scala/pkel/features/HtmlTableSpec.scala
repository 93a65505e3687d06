package pkel.features

import org.scalatest.funsuite.AnyFunSuite
import pkel.features.HtmlTable

/** Pure-JVM properties for the HTML table kernel, centred on the
  * `coords`↔`parse` consistency contract: a char offset inside a cell body
  * must map to the coordinates of THAT cell in `parse`'s post-strip space,
  * or (-1,-1) when the cell was stripped as an index row/column.
  * (The cascade e2e and the transcript table path only exercise the 4×3
  * synthesized shape; this spec covers index-strip interactions, tags inside
  * cells, ragged rows, and out-of-cell offsets.)
  */
class HtmlTableSpec extends AnyFunSuite {

  /** Build html while recording, per (rawRow, rawCol), one char offset inside
    * the cell body and the body's stripped text. */
  private def build(cells: Seq[Seq[String]], indexRow: Boolean, indexCol: Boolean,
      cornerBlank: Boolean = false): (String, Seq[((Int, Int), Int, String)]) = {
    val sb = new StringBuilder("<table>")
    val marks = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), Int, String)]
    val withIdxCol: Seq[Seq[String]] =
      if (indexCol) cells.zipWithIndex.map { case (r, i) => i.toString +: r } else cells
    val all: Seq[Seq[String]] =
      if (indexRow) {
        val width = withIdxCol.map(_.length).max
        val hdr = if (cornerBlank && indexCol) "" +: (0 until width - 1).map(_.toString)
        else (0 until width).map(_.toString)
        hdr +: withIdxCol
      } else withIdxCol
    all.zipWithIndex.foreach { case (row, r) =>
      sb.append("<tr>")
      row.zipWithIndex.foreach { case (cell, c) =>
        sb.append("<td>")
        val bodyStart = sb.length
        sb.append(cell)
        // build cells carry no tags/entities, so stripTags(cell) == cell.trim
        if (cell.nonEmpty) marks += (((r, c), bodyStart, cell.trim))
        sb.append("</td>")
      }
      sb.append("</tr>")
    }
    sb.append("</table>")
    (sb.toString, marks.toSeq)
  }

  private def checkAll(cells: Seq[Seq[String]], indexRow: Boolean, indexCol: Boolean,
      cornerBlank: Boolean = false): Unit = {
    val (html, marks) = build(cells, indexRow, indexCol, cornerBlank)
    val parsed = HtmlTable.parse(html)
    marks.foreach { case ((r, c), pos, stripped) =>
      val got = HtmlTable.coords(html, pos)
      val inStrippedRow = indexRow && r == 0
      val inStrippedCol = indexCol && c == 0
      if (inStrippedRow || inStrippedCol)
        assert(got == (-1, -1), s"offset in stripped index cell ($r,$c) must miss, got $got")
      else {
        val expR = if (indexRow) r - 1 else r
        val expC = if (indexCol) c - 1 else c
        assert(got == (expR, expC), s"cell ($r,$c) → expected ($expR,$expC), got $got for\n$html")
        assert(parsed(expR)(expC) == stripped,
          s"parse(${expR},${expC})='${parsed(expR)(expC)}' != '$stripped'")
      }
    }
  }

  test("coords maps every cell body offset to its parse coordinates (no index strip)") {
    checkAll(Seq(Seq("Parameter", "Value"), Seq("CL", "3.2"), Seq("t1/2", "7")), indexRow = false, indexCol = false)
  }

  test("coords under index-row strip: header row cells miss, data shift up") {
    checkAll(Seq(Seq("AUC", "12"), Seq("Vd", "40")), indexRow = true, indexCol = false)
  }

  test("coords under index-column strip: first column misses, data shift left") {
    checkAll(Seq(Seq("ka", "0.9"), Seq("F", "0.6")), indexRow = false, indexCol = true)
  }

  test("coords under BOTH strips with blank corner") {
    checkAll(Seq(Seq("Cmax", "5.5"), Seq("Tmax", "2")), indexRow = true, indexCol = true, cornerBlank = true)
  }

  test("coords with tags inside cell bodies and ragged rows") {
    val html = "<table><tr><td><b>CL</b> renal</td><td>1</td></tr><tr><td>half <i>life</i></td></tr></table>"
    val p = HtmlTable.parse(html)
    assert(p == Seq(Seq("CL renal", "1"), Seq("half life")))
    // offset of 'renal' (inside first cell body, after the <b> tag)
    assert(HtmlTable.coords(html, html.indexOf("renal")) == (0, 0))
    assert(HtmlTable.coords(html, html.indexOf("life")) == (1, 0))
  }

  test("out-of-cell offsets miss") {
    val html = "<table><tr><td>x</td></tr></table>"
    assert(HtmlTable.coords(html, 0) == (-1, -1))          // inside <table> tag
    assert(HtmlTable.coords(html, html.length - 1) == (-1, -1))
    assert(HtmlTable.coords(html, -5) == (-1, -1))
    assert(HtmlTable.coords("", 0) == (-1, -1))
    assert(HtmlTable.coords(null, 0) == (-1, -1))
  }

  test("randomized tables: coords/parse agree everywhere") {
    val rnd = new scala.util.Random(7)
    val words = Vector("CL", "AUC", "t1/2", "Vd", "ka", "3.2", "mg", "plasma", "oral", "7")
    (1 to 60).foreach { _ =>
      val nRows = 1 + rnd.nextInt(5)
      val nCols = 1 + rnd.nextInt(4)
      val cells = Seq.fill(nRows)(Seq.fill(nCols)(words(rnd.nextInt(words.length))))
      checkAll(cells, indexRow = rnd.nextBoolean(), indexCol = rnd.nextBoolean())
    }
  }
}
