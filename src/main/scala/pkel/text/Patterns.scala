package pkel.text

import java.util.regex.{Matcher, Pattern}

/** Normalization pattern inventory for the PK blocking-key kernel.
  *
  * Behavioral port of `/root/reference/pk_el/tokenizers/patterns.py:1-850`
  * (public reference; behavior only). Pattern application ORDER is
  * load-bearing — general groups run in list order, parameter families in the
  * replacement-map order below (`patterns.py:841-847`). All patterns are
  * compiled once per JVM (i.e. once per executor), never per row.
  */
object Patterns {
  import Rx.{ci, cs}

  // --- dash unification (10 Unicode dash variants → '-') -------------------
  val DashPattern: String = "[‐‑‒–—―−﹘﹣－]"

  // --- basic preprocessing -------------------------------------------------
  val StopWords: Pattern = ci(
    """\bof\b|\bat\b|\bby\b|\bon\b|\bthe\b|\bfrom\b|\band\b|\bis\b|\bin\b|\ban\b|\bwith\b|\bby\b|\bfor\b|\bit\b|\bas\b|\bbetween\b|\bbased\b""")
  val HtmlTag: Pattern = cs("""<[^>]+>""")
  val Plural: Pattern = cs("""(?<!s)(?<!mea)(?<!michaeli)s\b""")
  val BioPlural: Pattern = cs("""bioavailabilities|bioavailabilitie""")
  val HlPlural: Pattern = cs("""half[\s\-_]*(lives|live|times)""")
  val FractionSlash: Pattern = ci("⁄")

  // --- lexicons ------------------------------------------------------------
  val CommonChemicals: Set[String] = Set(
    "glucose", "inulin", "lactose", "sucrose", "fructose", "galactose", "mannitol",
    "creatinine", "bilirubin",
    "cortisol", "testosterone", "estradiol", "progesterone", "insulin",
    "cholesterol", "triglycerides", "ffa",
    "vitamin", "folate", "biotin",
    "caffeine", "theobromine", "nicotine", "ethanol",
    "hemoglobin", "albumin", "total protein")

  val ChemicalsRe: Pattern = ci(
    CommonChemicals.toSeq.sorted.map(Pattern.quote).mkString("""\b(?:""", "|", """)\b"""))

  val WhitespaceRun: Pattern = cs("""\s+""")

  /** Small stand-in drug lexicon (the reference calls an external dictionary
    * NER package, `pk_tokenizer.py:12-23`; offline semantics = "drop tokens
    * found in a drug lexicon"). Tokens are compared lowercased. */
  val DrugLexicon: Set[String] = Set(
    "midazolam", "warfarin", "digoxin", "rifampicin", "ketoconazole",
    "paracetamol", "acetaminophen", "ibuprofen", "metformin", "amoxicillin")

  val TokenRemovals: Set[String] = Set(
    "h", "hr", "hours", "hour", "min", "mins",
    "minutes", "seconds", "s", "secs",
    "day", "days", "week", "weeks", "month",
    "months", "time", "obs", "ob", "observed",
    "systemic", "to", "period", "compartment", "level")

  val SpecialCharacterMap: Map[String, String] = Map(
    "λ" -> "lambda", "α" -> "alpha", "β" -> "beta", "γ" -> "gamma",
    "%" -> "percentage", "z" -> "zeta", "θ" -> "theta")

  // --- disambiguation context patterns ------------------------------------
  val RateConstantUnit: Pattern = ci("""(?:1\s*/\s*h|h\s*[-⁻−]\s*1)""")
  val EnzymeContext: Pattern = ci(
    """\b(?:enzyme|michaelis[\s\-_]*menten|michaelis|menten|substrate|vmax|kinetic(?:s)?|affinity|saturation|nmol\s*(?:/|·|per)?\s*[lL](?:[-−⁻]1)?)\b""")
  val THalfBetaContext: Pattern = ci(
    """\b(?:two[\s\-_]*compartment(?:al)?|2[\s\-_]*compartment(?:al)?|multi[\s\-_]*compartment(?:al)?|biphasic|slow[\s\-_]*phase|second[\s\-_]*phase|latter[\s\-_]*phase|beta[\s\-_]*phase)\b""")
  val THalfGammaContext: Pattern = ci(
    """\b(?:gamma[\s\-_]*phase|triphasic|third[\s\-_]*phase|three[\s\-_]*compartment(?:al)?|3[\s\-_]*compartment(?:al)?)\b""")
  val THalfZContext: Pattern = ci(
    """\b(?:non[\s\-_]*compartment(?:al)?|nca|1[\s\-_]*compartment(?:al)?|one[\s\-_]*compartment(?:al)?)\b""")

  // --- token grammar -------------------------------------------------------
  val TokenRe: Pattern = cs(
    """t[\s_]*1/2|\d+/\d+|[a-zA-Z]+(?=\d+-)|\d+(?:\.\d+)?\s*-\s*[a-zA-Z]+|\d+(?:\.\d+)?\s*-\s*\d+(?:\.\d+)?|\b[a-zA-Z]\d{1}\b|[a-zA-Z]+|\d+(?:\.\d+)?|[%λαβγ]""")

  val TermStandardization: Seq[(Pattern, String)] = Seq(
    cs("""\b(?:ave|av|avg|mean)\b""") -> "average",
    cs("""\b(ext|extrap)\b""") -> "extrapolated")

  val RangeStandardization: Seq[(Pattern, String)] = Seq(
    cs("""0-\d+(?:\.\d+)?""") -> "t",
    cs("""0-t""") -> "t",
    cs("""0-inf""") -> "inf",
    cs("""0-last""") -> "last")

  val NumericRange: Pattern = cs("""^\d+(?:\.\d+)?-\d+(?:\.\d+)?$""")

  // --- NIL exclusion (mentions that look PK-ish but are not) ---------------
  val NilPatterns: Seq[Pattern] = Seq(
    """\bmic\b""",
    """\bminimum[\s\-_]*inhibitory[\s\-_]*concentration\b""",
    """\bceoinf\b""",
    """\bcl[\s\-_/:]*(cr|creatinine)\b""",
    """\bauc[\s\-_/:]*mic""",
    """\bauc\d+(\.\d+)?[\s\-_/:]*mic""",
    """\bauc\d+(\.\d+)?\s*[-–]\s*\d+(\.\d+)?[\s\-_/:]*mic""",
    """\bauc\d+(\.\d+)?(\s*[-–]\s*\d+(\.\d+)?)?[a-z]{1,2}\b[\s\-_/:]*mic""",
    """\beffective[\s\-_]*concentration\b""",
    """\beffective[\s\-_]*half[\s\-_]*life\b""",
    """\binhibitory[\s\-_]*concentration\b""",
    """\bic[\s\-_]*50\b""", """\bec[\s\-_]*50\b""",
    """\be[\s\-_]*max\b""", """\bi[\s\-_]*max\b""",
    """\bk[\s\-_]*off\b""", """\bk[\s\-_]*on\b""",
    """\bgfr\b""", """glomerular[\s\-_]*filtration[\s\-_]*rate""",
    """hill[\s\-_]*(slope|coefficient|constant)""",
    """\bp[\s\-_]*ka\b""", """\blog[\s\-_]*[pd]\b""", """\blog[\s\-_]*p\b""",
    """\bmolecular[\s\-_]*weight\b""", """\bmolecular[\s\-_]*mass\b""",
    """\bweight\b""", """\bmass\b""",
    """\bsolubility\b""", """\bpermeability\b""", """\bbinding[\s\-_]*affinity\b""",
    """therapeutic[\s\-_]*index""",
    """\btgf[-\s]*beta\b""", """\btnf[-\s]*alpha\b""",
    """\bcrp\b""", """\binterleukin\b""",
    """gene[\s\-_]*expression""", """\bmrna\b""",
    """\b(k[\s\-_]*d|k[\s\-_]*(tran|transit)|k[\s\-_]*feces|k[\s\-_]*i)\b""",
    """\bhvd\b""", """\barc[\s\-_]*trough\b""",
    """\bps[\s\-_]*dif\b""", """\bmtd\b""").map(ci)

  // --- general replacement chain (ordered groups) --------------------------
  sealed trait Repl { def apply(text: String): String }
  final case class Lit(p: Pattern, r: String) extends Repl {
    def apply(text: String): String = Rx.sub(p, text, r)
  }
  final case class Tmpl(p: Pattern, t: String) extends Repl {
    def apply(text: String): String = Rx.subT(p, text, t)
  }
  final case class Fn(p: Pattern, f: Matcher => String) extends Repl {
    def apply(text: String): String = Rx.subF(p, text)(f)
  }

  private def g(m: Matcher, i: Int): String = Option(m.group(i)).getOrElse("")
  private def firstOf(m: Matcher, a: Int, b: Int): String = {
    val va = m.group(a); if (va != null) va else g(m, b)
  }

  val GeneralReplacements: Seq[Repl] = Seq(
    // punctuation
    Lit(ci(DashPattern), "-"),
    Lit(ci("""--+"""), "-"),
    // numeric
    Lit(ci("""\b(1st|primary)\b"""), "first"),
    Lit(ci("""\b(2nd|secondary)\b"""), "second"),
    Lit(ci("""\b(3rd|tertiary)\b"""), "third"),
    Lit(ci("""\bzero\b"""), "0"),
    Lit(ci("""∞|infinity"""), "inf"),
    Lit(ci("""(?<=\d),(?=\d{3}\b)"""), ""),
    Lit(ci("""\bfraction\b"""), "percentage"),
    // time
    Tmpl(ci("""\b(\d+)\s*time\b"""), "$1"),
    Lit(ci("""(^|[\s\(\[\{.,;:-])(d|day)\s*(?=\d)"""), ""),
    // ranges ("X to Y" → "X-Y", "(1, t)" → "1-t", tighten spaced dashes)
    Fn(ci("""(\d+(\.\d+)?)\s*\bto\b\s*(\d+(\.\d+)?)|\b(\d+(\.\d+)?)\s*\bto\b\s*(inf|t|last)\b"""),
      m => s"${firstOf(m, 1, 5)}-${firstOf(m, 3, 7)}"),
    Tmpl(ci("""\(\s*(\d+)\s*,\s*([^)]+)\)"""), "$1-$2"),
    Fn(ci("""(\d+(\.\d+)?)\s*-\s*(\d+(\.\d+)?)|(\d+(\.\d+)?)\s*-\s*(inf|t)"""),
      m => s"${firstOf(m, 1, 5)}-${firstOf(m, 3, 7)}"),
    // formatting ("c l" → "cl" at start; "cl(h)" → "clh")
    Tmpl(ci("""^\b([a-zA-Z]) ([a-zA-Z]+)\b"""), "$1$2"),
    Tmpl(ci("""(\b[a-zA-Z]+)\(\s*([a-zA-Z]+)\s*\)"""), "$1$2"),
    // terms
    Lit(ci("""\bdistributional\b"""), "distribution"),
    Lit(ci("""\bperiperhal\b"""), "peripheral"),
    Lit(ci("""\b(?:steady[\s\-]state)\b"""), "ss"),
    Lit(cs("""(τ|tau)"""), "t"),
    Lit(ci("""\b(?:normalized|normalised|normalize|normalise|norm)\b"""), "normalised"),
    Lit(ci("""(maximal|maximum)"""), "max"),
    Lit(ci("""(minimum|minimal)"""), "min"),
    Lit(ci("""bloavailability"""), "bioavailability"),
    Lit(ci("""t\s*\(*?\s*l\s*/\s*2\s*\)?"""), "t1/2"),
    Lit(ci("""^(θ|theta|tv)"""), ""),
    // scaling ("/F" → bionorm, "\d+kg" → drop, "/dose" → dosenorm)
    Lit(ci("""_f\b|/\s*f|/\s*bioavailability\b|\bbioavailability[\s\-_]+normalised\b|\bbioavailability[\s\-_]+adjusted\b"""), " bionorm "),
    Lit(ci("""\b\d+\s*kg\b"""), " "),
    Lit(ci("""/dose(\d|[a-zA-Z])?\b|/d\b|dose[\s\-_]+normalised|\(\s*dn\s*\)|per[\s\-_]+dose|normalised"""), " dosenorm "),
    // removals
    Lit(ci("""_"""), " "),
    Lit(ci("""\b(fluid|plasma|serum|cerebrospinal|csf|urine|feces|saliva|bile|gastric|sputum|breast\s*milk|lung|subcutaneous|sweat|tears)\b"""), ""),
    Lit(ci("""\b(?:(tv|θ)(?=\s*\w))"""), ""),
    Lit(ci("""\b(?:dose|drug|body|total|value|observed|compartment|observed)\b"""), ""),
    // common fused forms ("aucss" → "auc ss")
    Tmpl(ci("""\b(?<!-)(auc|aumc|mrt|c|vd|v|t)(tend|all|tlast|last|inf|ss|z|t)\b"""), "$1 $2"))

  // --- parameter-family canonicalization (ordered) -------------------------
  // (family, pattern, replacement); applied strictly in this order.
  val ParameterReplacements: Seq[(String, Pattern, String)] = Seq(
    ("c", ci("""\b(?:concentration|concn)\b"""), "c"),
    ("auc", ci("""\b(?:area[\s\-_]*under\s+.*?\s*curve|(?:systemic[\s\-_]*)exposure|total[\s\-_]*exposure|exposure|auc\s*to)\b"""), "auc"),
    ("auc_ratio", ci("""\b(?:auc[\w–\-,\s]*/\s*auc[\w–\-,\s]*|auc[\s\-_]?r|auc[\s\-_]?dr|relative[\s\-_]?auc|auc[\s\-_]?interaction[\s\-_]?ratio|parent[\s\-:_]*metabolite[\s\-_]*(?:auc[\s\-_]*)?ratio)\b"""), "auc ratio"),
    ("auclast", ci("""(?:last[\s\-_]*(measurable|measured)[\s\-_]*c|last[\s\-_]*(?:obs|meas)|0-(?:tend|tlast|last)|\ball|\btend|\btlast|\blast)\b"""), " last"),
    ("auct", ci("""\b(?:auc[\s\-_]*(\d+(?:\.\d+)?)(?![.\d-])\s*(?:hours|hour|hr|h|days|day|d|minutes|min?)?|auc[\s\-_]*(?:d|day)(\d+)|interval\s+auc)\b"""), "auc t"),
    ("aumc", ci("""\b(?:(?:auc[\s\-_]*)?first[\s\-_]*moment[\s\-_]*(curve)?)\b"""), "aumc"),
    ("fr", ci("""\b(?:renal[\s\-_]*bioavailability)\b"""), "fr"),
    ("fg", ci("""\b(?:gut[\s\-_]*wall[\s\-_]*bioavailability)\b"""), "fg"),
    ("fh", ci("""\b(?:hepatic[\s\-_]*bioavailability)\b"""), "fh"),
    ("frel", ci("""\b(?:relative\s+(?:bioavailability|systemic\s+availability))\b"""), "frel"),
    ("fab", ci("""\b(?:(?:absolute\s+)?(?:oral\s+)?bioavailability|percentage\s+absorbed|systemic\s+availability|f[\s\-_]*(abs|ab|a)|f(?!\S))\b"""), " f "),
    ("cl", ci("""\b(?:(clearance|cl)[\s\-]*rate|(?:total\s+)?clearance|elimination[\s\-]*cl|cl(total|tot|t)|clp|cl(?!\d+-\d+)\d+|\(\s*cl\s*\))\b"""), "cl"),
    ("clr", ci("""\b(?:(renal|urinary)[\s\-]*cl|cl[,\s\-]*r)\b"""), "clr"),
    ("clb", ci("""\b(?:blood[\s\-]*cl|cl[,\s\-]*b)\b"""), "clb"),
    ("clnr", ci("""\b(?:nonrenal[\s\-]*cl|cl[,\s\-]*nr)\b"""), "clnr"),
    ("clu", ci("""\b(?:unbound[\s\-]*cl|cl[,\s\-]*u)\b"""), "clu"),
    ("clint", ci("""\b(?:intrinsic[\s\-]*metabolic[\s\-]*cl|intrinsic[\s\-]*cl|enzyme[\s\-]*mediated[\s\-]*cl|intrinsic[\s\-]*clint|cl[,\s\-]*int)\b"""), "clint"),
    ("clh", ci("""\b(?:hepatic[\s\-]*cl|cl[,\s\-]*h)\b"""), "clh"),
    ("cl_f", ci("""\b(?:cl[\s\-_]*(?:po|(zeta|z))|(?:oral|apparent)(?:[\s\-_]*(oral|apparent))?[\s\-_]*cl)\b"""), "cl bionorm"),
    ("q", ci("""\b(?:inter[\s\-]*compartment(?:al)?[\s\-_]*cl(\s*central\s*peripheral)?|q\s*(?:p)?\s*1|first[\s\-]*inter[\s\-]*compartment(?:al)?[\s\-_]*cl|distribution(?:al)?[\s\-_]*cl)\b"""), "q"),
    ("q2", ci("""\b(?:q\s*central[\s\-]*second[\s\-]*peripheral|q\s*(?:p)?\s*2|second[\s\-]*q)\b"""), "q2"),
    ("t", ci("""\b(?:time(?:[\s\-_]*(to[\s\-_]*reach|to))?)\b"""), "t"),
    ("tmax", ci("""\b(?:(?:(max|peak)[\s\-_]*)?t(?:[\s\-_](cmax|c))|t[\s\-_]*(?:max|peak)(?:[\s\-_]*c)?|t[\s\-_]*cmax|t[\s\-_]*(max)|(?:max|peak)[\s\-_]*t)\b"""), "tmax"),
    ("tlag", ci("""\b(?:alag|absorption\s*lag\s*t|lag\s*t)\b"""), "tlag"),
    ("mrt", ci("""\b(?:mean\s*residence\s*t|average\s*residence\s*(time|t)|mrt0-[a-zA-Z]+|mrt[a-zA-Z]+)\b"""), "mrt"),
    ("mtt", ci("""\b(?:m\s*tt|mean\s*transit\s*t)"""), "mtt"),
    ("mat", ci("""\b(?:mean\s*absorption\s*(time|t)|average\s*absorption\s*(time|t)|mat)\b"""), "mat"),
    ("ct", ci("""\b(?:c\s?\(?(?![^)]*-)(?!0)[0-9]+\s?(?:hr|h|hours|days|day|minutes|mins|min|')?\)?|day\s*\d+\s*c|c\s*day\s*\d+|c[\s\-]*(d|day)[\s\-]*\d+)\b"""), "c t"),
    ("cmax", ci("""\b(?:c[\s\-_]*peak(\d|[a-zA-Z])?|c[\s\-_]*max(\d|[a-zA-Z])?|peak(\s*c)?|max(?:imum|imal)?\s*(?:c|level|peak)|cp[\s\-_]*max)\b"""), "cmax"),
    ("cmin", ci("""\b(?:min(?:imum|imal)?\s*c|c[\s\-_]*min(\d|[a-zA-Z])?)\b"""), "cmin"),
    ("ctrough", ci("""\b(?:c[\s\-_]*trough|c[\s\-_]*pre|pre[\s\-_]*level|trough(?:[\s\-_]*(c|level))?)\b"""), "ctrough"),
    ("c0", ci("""\b(?:c[\s\-_]*0|extrapolated[\s\-_]*c)\b"""), "c0"),
    ("cavg", ci("""\b(?:c[\s\-_]*average|c[\s\-_]*(avg|ave|av)(?:[\s\-_,]*\d+)?|average[\s\-_]*c)\b"""), "cavg"),
    ("v", ci("""\b(?:v[\s\-_]*z|v[\s\-_]*d|v[\s\-_]*beta|v[\s\-_]*gamma|distribution\s*volume|volume\s*distribution|volume|v)\b"""), "v"),
    ("v1", ci("""\b(?:v[\s\-_]*1|v[\s\-_]*c|central[\s\-_]*v|v[\s\-_]*central)\b"""), "v1"),
    ("v3", ci("""\b(?:v[\s\-_]*3|v[\s\-_]*p[\s\-_]*2|second[\s\-_]?peripheral[\s\-_]?v)\b"""), "v3"),
    ("v2", ci("""\b(?:v[\s\-_]*p(?:1)?|v[\s\-_]*2|peripheral[\s\-_]*v)\b"""), "v2"),
    ("t1/2", ci("""(?:\b(?:half[\s\-_]*(life|lives|live|time|t)|hl)\b|t\s*\(*?\s*1\s*/\s*2\s*\)?|t[\s\-_]*0.5)"""), "t1/2"),
    ("t1/2_alpha", ci("""\b(?:(?:initial|fast|first|early|distribution|alpha)(?:[\s\-_]*phase)?[\s\-_]*t1/2|t1/2[\s\-_]*(?:initial|fast|first|early|distribution|alpha)(?:[\s\-_]*phase)?|(distribution)[\s\-_]*t1/2|t1/2[\s\-_]*distribution)\b"""), "t1/2 alpha"),
    ("t1/2_beta", ci("""\b(?:(?:secondary|second|slow|beta|late|latter)(?:[\s\-_]*phase)?[\s\-_]*t1/2|t1/2[\s\-_]*(?:secondary|second|slow|beta|late|latter)(?:[\s\-_]*phase)?|t1/2[\s\-_]*calculated[\s\-_]*beta[\s\-_]*slope)\b"""), "t1/2 beta"),
    ("t1/2_gamma", ci("""\b(?:(?:tertiary|third|gamma)(?:[\s\-_]*phase)?[\s\-_]*t1/2|t1/2[\s\-_]*(?:tertiary|third|gamma)(?:[\s\-_]*phase)?|t1/2[\s\-_]*calculated[\s\-_]*gamma[\s\-_]*slope)\b"""), "t1/2 gamma"),
    ("t1/2_ka", ci("""\b(?:absorption(?:[\s\-_]*phase)?[\s\-_]*t1/2|t1/2[\s\-_]*absorption(?:[\s\-_]*phase)?|t1/2[\s,/-]*(?:abs|ab|a)|k[\s\-_]*01[\s\-_]*t1/2)\b"""), "t1/2,ka"),
    ("t1/2_el", ci("""\b(?:(apparent|terminal)[\s\-_]*(?:(elimination|disposition|terminal)[\s\-_]*)?t1/2(?:[\s\-_]*(elimination|disposition))?|(elimination|disposition|terminal)[\s\-_]*t1/2|terminal(?:[\s\-_]*phase)?[\s\-_]*t1/2|t1/2[\s\-_]*terminal(?:[\s\-_]*phase)?|t1/2(?:[\s,/-]*(?:elimination|el|apparent|app|terminal|λ(zeta|z)|(zeta|z)|ke))|k[\s\-_]*10[\s\-_]*t1/2|effective[\s\-_]*t1/2)\b"""), "t1/2"),
    ("z", ci("""\b(?:terminal([\s\-_]*phase)?)\b"""), "z"),
    ("k", ci("""\b(?:rate[\s\-_]*constant)\b"""), " k "),
    ("kabs", ci("""\b(?:k[\s\-_]*(?:absorption|abs|ab|a|01)|(?:first[\s\-_]*order\s*)?absorption[\s\-_]*(k|rate)|rate[\s\-_]*absorption)\b"""), " kabs "),
    ("kexcr", ci("""\b(?:(?:urinary[\s\-_]*)?excretion[\s\-_]*(k|rate)|(k|rate)[\s\-_]*excr(?:etion)?)\b"""), " kexcr "),
    ("kmet", ci("""\b(?:metabolite[\s\-_]*elimination[\s\-_]*(k|rate)|k[\s\-_]*met(?:abolite)?)\b"""), " kmet "),
    ("kel", ci("""\b(?:k[\s\-_]*(?:elimination|el|e|10)|rate[\s\-_]*elimination|elimination[\s\-_]*constant|(?:first[\s\-_]*order\s*)?elimination[\s\-_]*(k|rate)|(lambda|λ)[\s\-_]*(zeta|z)|(lambda|λ))\b"""), " kel "),
    ("kcomp", ci("""\b(?:(transfer|distribution)\s*(k|rate)\s*(central\s*(?:to\s*)?peripheral|(central\s*(?:to\s*)?second\s*peripheral|peripheral\s*(?:to\s*)?central|second\s*peripheral\s*(?:to\s*)?central)?)|(k|rate)\s*(transfer|distribution)\s*(central\s*(?:to\s*)?peripheral|(central\s*(?:to\s*)?second\s*peripheral|peripheral\s*(?:to\s*)?central|second\s*peripheral\s*(?:to\s*)?central)?)|k[\s\-_]*(12|21|13|31|24|42|23|32|34|43)\b)\b"""), " kcomp "),
    ("ae", ci("""\b(?:cumulative[\s\-_]*excretion[\s\-_]*amount|amount[\s\-_]*excreted)\b"""), " ae "),
    ("fe", ci("""\b(?:percentage[\s\-_]*excreted[\s\-_]*unchanged|(cumulative[\s\-_]*)?(urinary|fecal)[\s\-_]*(excretion|excr|recovery(\s*rate)?)|renal[\s\-_]*(excretion|excr)|(excretion|excr))\b"""), " fe "),
    ("km", ci("""\b(?:michaelis[\s‐\-]*menten[\s‐\-]*(constant)?)\b"""), " km "),
    ("vmax", ci("""\b(?:max(?:imum|imal)?[\s\-_]*enzyme[\s\-_]*activity)\b"""), " vmax "),
    ("eh", ci("""\b(?:hepatic[\s\-_]*extraction[\s\-_]*ratio)\b"""), " eh "),
    ("e", ci("""\b(?:extraction[\s\-_]*ratio)\b"""), " e "),
    ("fm", ci("""\b(?:metabolic[\s\-_]*conversion[\s\-_]*percentage)\b"""), " fm "),
    ("fu", ci("""\b(?:percentage[\s\-_]*unbound|percentage[\s\-_]*protein[\s\-_]*unbound|free[\s\-_]*percentage|protein[\s\-_]*binding[\s\-_]*ratio|protein[\s\-_]*binding)\b"""), " fu "),
    ("blood_flow", ci("""\b(?:blood[\s\-_]*flow)\b"""), " blood flow "))

  // --- trailing specials ---------------------------------------------------
  val ConcVsTime: Pattern = ci("""\bc\s*(?:versus|vs|[-:/])\s*t\b|\bcxt\b""")
  val PhaseWord: Pattern = ci("""\b(?:phase)\b""")
  val ApparentWords: Pattern = ci("""\b(?:apparent|app|z)\b""")
}
