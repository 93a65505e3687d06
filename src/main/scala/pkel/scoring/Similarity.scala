package pkel.scoring

/** Pairwise string/vector similarity kernels.
  *
  * `indelRatio` reproduces rapidfuzz `ratio` semantics (normalized Indel
  * similarity ∈ [0,100]) used by the reference's fuzzy tier
  * (`/root/reference/pk_el/linkers/fuzzy_linker.py:18-20`); `tokenSetScore`
  * reproduces `fuzzy_token_set_score` (`:8-15`). Jaro-Winkler and cosine are
  * the graft's combined-score additions (BASELINE.json north_star). All
  * functions are pure, allocation-light, and meant to run inside batched
  * `mapPartitions` kernels.
  */
object Similarity extends Serializable {

  /** Longest common subsequence length, two-row DP (O(|a|·|b|), short keys). */
  def lcsLength(a: CharSequence, b: CharSequence): Int = {
    val m = a.length; val n = b.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= n) {
        curr(j) = if (ca == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), curr(j - 1))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n)
  }

  /** rapidfuzz `ratio`: 100 · (1 − indel_distance/(|a|+|b|)) = 200·LCS/(|a|+|b|). */
  def indelRatio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 100.0
    200.0 * lcsLength(a, b) / total
  }

  /** fuzzy_token_set_score: fraction of tokens in `a` whose best `indelRatio`
    * against `b` reaches `perTokenThreshold`, over max(|a|,|b|), ×100. */
  def tokenSetScore(a: Iterable[String], b: Iterable[String], perTokenThreshold: Double = 80.0): Double = {
    val na = a.size; val nb = b.size
    if (na == 0 && nb == 0) return 0.0
    var matched = 0
    val bi = b.toArray
    a.foreach { t1 =>
      var best = 0.0
      var i = 0
      while (i < bi.length) {
        val s = indelRatio(t1, bi(i))
        if (s > best) best = s
        i += 1
      }
      if (best >= perTokenThreshold) matched += 1
    }
    matched.toDouble / math.max(na, nb) * 100.0
  }

  /** Jaro similarity ∈ [0,1]. */
  def jaro(a: String, b: String): Double = {
    val m = a.length; val n = b.length
    if (m == 0 && n == 0) return 1.0
    if (m == 0 || n == 0) return 0.0
    val window = math.max(0, math.max(m, n) / 2 - 1)
    val aMatched = new Array[Boolean](m)
    val bMatched = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window); val hi = math.min(n - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < m) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2.0
    (matches.toDouble / m + matches.toDouble / n + (matches - t) / matches) / 3.0
  }

  /** Jaro-Winkler ∈ [0,1] (prefix scale 0.1, max prefix 4, boost above 0.7). */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var prefix = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (prefix < max && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1 - j)
  }

  /** Plain Levenshtein distance (unit costs), two-row DP. */
  def levenshtein(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= n) {
        val cost = if (ca == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(prev(j) + 1, curr(j - 1) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n)
  }

  /** Normalized Levenshtein similarity ∈ [0,1]. */
  def levenshteinSim(a: String, b: String): Double = {
    val max = math.max(a.length, b.length)
    if (max == 0) 1.0 else 1.0 - levenshtein(a, b).toDouble / max
  }

  /** Dot product of two equal-length float vectors (pre-normalized ⇒ cosine). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Cosine similarity of arbitrary (not necessarily normalized) vectors. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else s / math.sqrt(na * nb)
  }
}
