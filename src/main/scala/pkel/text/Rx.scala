package pkel.text

import java.util.regex.{Matcher, Pattern}

/** Small regex toolkit mirroring Python `re` semantics on Java regex.
  *
  * The reference pipeline (see `/root/reference/pk_el/tokenizers/patterns.py`)
  * relies on Python-`re` Unicode behavior: `\w`/`\b`/`\d` are Unicode-aware and
  * IGNORECASE folds Unicode case. Java needs explicit flags for the same
  * semantics, so every pattern here is compiled with
  * UNICODE_CHARACTER_CLASS (+ UNICODE_CASE when case-insensitive).
  */
object Rx {
  private val CS = Pattern.UNICODE_CHARACTER_CLASS
  private val CI = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS

  /** Compile case-insensitively (Python re.IGNORECASE equivalent). */
  def ci(p: String): Pattern = Pattern.compile(p, CI)

  /** Compile case-sensitively but Unicode-aware. */
  def cs(p: String): Pattern = Pattern.compile(p, CS)

  /** Substitute every match with a literal replacement string. */
  def sub(p: Pattern, text: String, repl: String): String =
    p.matcher(text).replaceAll(Matcher.quoteReplacement(repl))

  /** Substitute using a `$1`-style template (groups that did not participate
    * expand to the empty string, as in Python). */
  def subT(p: Pattern, text: String, template: String): String =
    p.matcher(text).replaceAll(template)

  /** Substitute with a per-match function (Python's callable replacement). */
  def subF(p: Pattern, text: String)(f: Matcher => String): String = {
    val m = p.matcher(text)
    val sb = new java.lang.StringBuilder
    while (m.find()) m.appendReplacement(sb, Matcher.quoteReplacement(f(m)))
    m.appendTail(sb)
    sb.toString
  }

  /** True if the pattern matches anywhere in the text (re.search). */
  def search(p: Pattern, text: String): Boolean = p.matcher(text).find()

  /** True if the pattern matches at the start (re.match on full token). */
  def matches(p: Pattern, text: String): Boolean = p.matcher(text).matches()

  /** All non-overlapping matches, left to right (re.findall on group 0). */
  def findAll(p: Pattern, text: String): List[String] = {
    val m = p.matcher(text)
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }
}
