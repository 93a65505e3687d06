package pkel.scoring

import scala.util.hashing.MurmurHash3

/** Deterministic stand-in text encoder.
  *
  * The reference's bi-encoder tier uses a sentence-transformer
  * (`intfloat/e5-small-v2`, 384-d, L2-normalized —
  * `/root/reference/pk_el/linkers/representation_linkers.py:20,56`). That
  * model is unavailable offline, so the engine ships a deterministic hashed
  * character-n-gram encoder with the same interface contract (`String =>
  * Array[Float]`, L2-normalized, fixed dim): word unigrams + char 3/4-grams
  * hashed into `dim` buckets with a sign hash. Any real encoder can be
  * swapped in; every downstream stage only assumes normalized vectors.
  */
final class Embedder(val dim: Int = 384) extends Serializable {

  private val seedBucket = 0x9747b28c
  private val seedSign = 0x5bd1e995

  private def add(vec: Array[Float], feature: String, weight: Float): Unit = {
    val h = MurmurHash3.stringHash(feature, seedBucket)
    val s = MurmurHash3.stringHash(feature, seedSign)
    val idx = math.floorMod(h, dim)
    vec(idx) += (if ((s & 1) == 0) weight else -weight)
  }

  /** Encode to an L2-normalized `dim`-vector. Deterministic. */
  def encode(text: String): Array[Float] = {
    val vec = new Array[Float](dim)
    if (text == null) return vec
    val t = text.toLowerCase
    // word unigrams
    var start = 0
    val n = t.length
    var i = 0
    while (i <= n) {
      if (i == n || !Character.isLetterOrDigit(t.charAt(i))) {
        if (i > start) add(vec, "w:" + t.substring(start, i), 1.0f)
        start = i + 1
      }
      i += 1
    }
    // char 3-grams and 4-grams over the padded string
    val padded = "\u0002" + t + "\u0003"
    var k = 3
    while (k <= 4) {
      var j = 0
      while (j + k <= padded.length) {
        add(vec, k.toString + ":" + padded.substring(j, j + k), 0.5f)
        j += 1
      }
      k += 1
    }
    // L2 normalize
    var norm = 0.0
    i = 0
    while (i < dim) { norm += vec(i).toDouble * vec(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { vec(i) *= inv; i += 1 }
    }
    vec
  }
}

object Embedder {
  val default = new Embedder(384)
}
