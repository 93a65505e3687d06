package pkel.text

/** Tokenizer registry (N13, `exact_linker.py:17-33`). The model-based
  * alternatives of the reference (scispacy / nltk) are out of scope offline
  * (SURVEY.md §2.3 N11); "whitespace" is the engine's plain fallback. */
object Tokenizers {
  val registry: Map[String, String => Seq[String]] = Map(
    "pk" -> (s => PkTokenizer(s)),
    "basic" -> (s => BasicNormalizer.tokenize(s)),
    "whitespace" -> (s => Option(s).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq))

  def apply(name: String): String => Seq[String] =
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"Unknown tokenizer '$name'. Must be one of: ${registry.keys.mkString(", ")}"))
}
