package pkel.text

import java.text.Normalizer

/** Text pre-normalization ahead of PK tokenization.
  *
  * Behavioral port of `basic_preprocessing`
  * (`/root/reference/pk_el/tokenizers/basic_tokenizer.py:8-21`): lowercase →
  * NFKC → nbsp→space → fraction slash → stopword removal → HTML-tag strip →
  * plural strip → bioavailability / half-life plural fixes. Idempotent for
  * all inputs the golden corpus covers (call sites in the reference apply it
  * twice; see SURVEY.md §7.5 item 6).
  */
object BasicNormalizer extends Serializable {
  import Patterns._

  def apply(raw: String): String = {
    if (raw == null) return ""
    var text = raw.toLowerCase
    text = Normalizer.normalize(text, Normalizer.Form.NFKC).replace(' ', ' ')
    text = Rx.sub(FractionSlash, text, "/")
    text = Rx.sub(StopWords, text, "")
    text = Rx.sub(HtmlTag, text, "")
    text = Rx.sub(Plural, text, "")
    text = Rx.sub(BioPlural, text, "bioavailability")
    text = Rx.sub(HlPlural, text, "half life")
    text
  }

  /** basic_tokenizer: normalize + whitespace split. */
  def tokenize(raw: String): Seq[String] =
    apply(raw).split("\\s+").filter(_.nonEmpty).toSeq
}
