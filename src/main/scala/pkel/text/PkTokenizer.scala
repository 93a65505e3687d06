package pkel.text

/** The PK blocking-key kernel: mention text → canonical sorted-dedup token set.
  *
  * Behavioral port of `pk_tokenizer`
  * (`/root/reference/pk_el/tokenizers/pk_tokenizer.py:48-97`). The returned
  * sorted, de-duplicated token list IS the blocking key of the engine
  * (`exact_linker.py:70,98`); two mentions are block-mates iff their token
  * lists are equal. Everything is pure and executor-local: all patterns are
  * `val`s compiled once per JVM.
  */
object PkTokenizer extends Serializable {
  import Patterns._

  /** Drop whitespace tokens found in the drug lexicon, rejoin with " "
    * (reference semantics: dictionary-NER removal, `pk_tokenizer.py:12-23`;
    * the join collapses whitespace runs exactly as `" ".join(text.split())`). */
  private def removeDrugNames(text: String): String =
    text.split("\\s+").iterator.filter(t => t.nonEmpty && !DrugLexicon.contains(t.toLowerCase))
      .mkString(" ")

  /** Whole-word removal of common studied chemicals, then whitespace collapse
    * (`pk_tokenizer.py:25-36`). */
  private def removeChemicals(text: String): String =
    Rx.sub(WhitespaceRun, Rx.sub(ChemicalsRe, text, ""), " ").trim

  def apply(raw: String): Seq[String] = {
    var text = BasicNormalizer(raw)
    text = removeDrugNames(text)
    text = removeChemicals(text)

    // ordered general replacement chain (order is semantic)
    GeneralReplacements.foreach { r => text = r(text) }

    // parameter-family canonicalization, strictly ordered
    ParameterReplacements.foreach { case (_, p, repl) => text = Rx.sub(p, text, repl) }

    // trailing specials
    text = Rx.sub(ConcVsTime, text, "")
    text = Rx.sub(PhaseWord, text, "")
    text = Rx.sub(ApparentWords, text, "bionorm")

    // token grammar extraction
    var tokens = Rx.findAll(TokenRe, text)

    // special-symbol mapping (exact token match), unit/noise removal,
    // term + range standardization, numeric-range drop
    tokens = tokens.map(t => SpecialCharacterMap.getOrElse(t, t))
    val updated = tokens.iterator.filterNot(TokenRemovals.contains).map { t0 =>
      var t = t0
      TermStandardization.foreach { case (p, r) => t = Rx.sub(p, t, r) }
      RangeStandardization.foreach { case (p, r) => t = Rx.sub(p, t, r) }
      t
    }.filterNot(t => Rx.matches(NumericRange, t)).toList

    // sorted + dedup → THE blocking key
    updated.distinct.sorted
  }

  /** Canonical blocking-key string: space-joined sorted-distinct tokens. */
  def blockingKey(raw: String): String = apply(raw).mkString(" ")
}
