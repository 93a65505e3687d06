package pkel.blocking

import java.util.regex.Pattern
import pkel.text.Rx

/** Category-level blocking patterns: regexes that assign a mention to a
  * candidate subset (category G1–G9 / specific parameter ids) of the ontology,
  * pruning the candidate space before pairwise scoring.
  *
  * Behavioral port of
  * `/root/reference/pk_el/tokenizers/ontology_subset_patterns.py:6-157`.
  * Iteration order of the pattern maps is semantic (dict insertion order in
  * the reference) — kept as ordered Seqs.
  */
object SubsetPatterns {
  import Rx.ci

  /** (pattern, category ids) in reference insertion order. */
  val CategoryPatterns: Seq[(Pattern, Seq[String])] = Seq(
    ci("""(?:auc|aumc|area[\s\-_]*under)""") -> Seq("G1"),
    ci("""(?:(?<![\w/])f(?!\w)|\bf[\s\-_]*r\b|\bf[\s\-_]*g|\bf[\s\-_]*h|\bf[\s\-_]*rel|\bf[\s\-_]*ab|bioavailability|absorption)""") -> Seq("G2"),
    ci("""(?:\bcl|clearance|\bcl[\s\-_]*r|\bcl[\s\-_]*b|\bcl[\s\-_]*nr|\bcl[\s\-_]*u\b|\bcl[\s\-_]*h|(?<![\w/])q(?!\w)|\bq[\s\-_]*2|\bae|\bfe\b|excretion|excreted|recovery)""") -> Seq("G3"),
    ci("""(?:concentration|\bc[\s\-_]*max|\bc[\s\-_]*0|\bc[\s\-_]*t|\bc[\s\-_]*min|\bc[\s\-_]*ss|\bc[\s\-_]*avg|\bc[\s\-_]*trough|peaked|peak|(?<![\w/])c\b)""") -> Seq("G4"),
    ci("""(?:\bt[\s\-_]*1/2|half[\s\-_]*life)""") -> Seq("G5"),
    ci("""(?:rate[\s\-_]constant|\bk[\s\-_]*el|\bk[\s\-_]*excr|\bk[\s\-_]*abs|\bk[\s\-_]*met|\bk[\s\-_]*m|\bk[\s\-_]*comp|(?<![\w/])k\b|alpha|beta\b)""") -> Seq("G6"),
    ci("""(?:t[\s\-_]*max|t[\s\-_]*lag|t[\s\-_]*ss|ss[\s\-_]*t|mrt|(?<!\w)mat\b|mtt)""") -> Seq("G7"),
    ci("""(?:volume|\bv[\s\-_]*1|\bv[\s\-_]*2|\bv[\s\-_]*3|(?<![\w/])v)""") -> Seq("G8"),
    ci("""(?:\bv[\s\-_]*max|\bk[\s\-_]*m|\bf[\s\-_]*m|\bf[\s\-_]*u|\beh|(?<![\w/])e(?!\w)|blood[\s\-_]*flow|metabolic|metabolism|extraction|michaelis|enzyme|unbound)""") -> Seq("G9"))

  /** NOTE: the reference maps the time patterns to G7 and volume patterns to
    * G8 via dict key order (`ontology_subset_patterns.py:119-129`); the list
    * above already reflects the pattern→category binding, with the
    * `time_patterns` entry positioned at the G7 slot. */

  /** Priority tiers resolving multi-category matches. */
  val CategoryPriorities: Seq[Set[String]] = Seq(
    Set("G1", "G2", "G3", "G5"),
    Set("G4", "G5", "G9", "G7"),
    Set("G8", "G6"))

  /** (pattern, parameter ids) for the parameter-level fallback. */
  val ParameterPatterns: Seq[(Pattern, Seq[String])] = Seq(
    ci("""ratio""") -> Seq("Q21", "Q31", "Q33", "Q35", "Q58", "Q93"),
    ci("""ss\b""") -> Seq("Q18", "Q34", "Q72", "Q65"),
    ci("""bionorm""") -> Seq("Q27", "Q69", "Q80", "Q76", "Q290", "Q82", "Q78"),
    ci("""dosenorm""") -> Seq("Q189", "Q174"),
    ci("""\d+(?:\.\d+)?\s*-\s*\d+(?:\.\d+)?""") -> Seq("Q19"),
    ci("""\d+(?:\.\d+)?\s*-\s*[a-zA-Z]+""") -> Seq("Q19", "Q18", "Q74", "Q17", "Q20", "Q189", "Q21"),
    ci("""max\b""") -> Seq("Q66", "Q56", "Q93", "Q32", "Q174", "Q33"))

  /** match_categories (`exact_linker.py:273-282`): try category patterns on
    * the pk-token string; if none match, retry on the raw mention. */
  def matchCategories(pkTokens: String, mention: String): Seq[String] = {
    val onTokens = CategoryPatterns.collect { case (p, cats) if Rx.search(p, pkTokens) => cats }.flatten
    if (onTokens.nonEmpty) onTokens
    else CategoryPatterns.collect { case (p, cats) if Rx.search(p, mention) => cats }.flatten
  }

  /** match_parameters (`exact_linker.py:284-293`). */
  def matchParameters(pkTokens: String, mention: String): Seq[String] = {
    val onTokens = ParameterPatterns.collect { case (p, ids) if Rx.search(p, pkTokens) => ids }.flatten
    if (onTokens.nonEmpty) onTokens
    else ParameterPatterns.collect { case (p, ids) if Rx.search(p, mention) => ids }.flatten
  }

  /** apply_category_priority (`exact_linker.py:295-301`): first tier with any
    * match wins; result order follows the tier-set intersection. */
  def applyCategoryPriority(categories: Seq[String]): Seq[String] = {
    val set = categories.toSet
    CategoryPriorities.collectFirst {
      case tier if (set & tier).nonEmpty => (set & tier).toSeq.sorted
    }.getOrElse(set.toSeq.sorted)
  }
}
