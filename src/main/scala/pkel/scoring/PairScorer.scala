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
  * surface strings, optionally `vec_a/vec_b` per-mention embeddings computed
  * once upstream and carried through `PairGen`). When the vector columns are
  * present the encoder never runs per pair — the scale path for
  * high-cardinality surfaces where a per-partition memo would thrash; without
  * them the kernel encodes from the raw mention behind a bounded memo.
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
    * mention_b [, vec_a, vec_b]). Appends (key_sim, jw_sim, cos_sim, score);
    * the vector columns are consumed and dropped (pair rows downstream carry
    * scores, not payloads). */
  def scorePairs(pairs: DataFrame, w: Weights = Weights(),
      embedder: Embedder = Embedder.default): DataFrame = {
    val hasVecs = pairs.schema.fieldNames.contains("vec_a") &&
      pairs.schema.fieldNames.contains("vec_b")
    val keptFields = pairs.schema.fields.toSeq.filterNot(f =>
      hasVecs && (f.name == "vec_a" || f.name == "vec_b"))
    val outSchema = StructType(keptFields ++ Seq(
      StructField("key_sim", DoubleType), StructField("jw_sim", DoubleType),
      StructField("cos_sim", DoubleType), StructField("score", DoubleType)))
    val keptIdx = keptFields.map(f => pairs.schema.fieldIndex(f.name)).toArray
    val iKeyA = pairs.schema.fieldIndex("key_a")
    val iKeyB = pairs.schema.fieldIndex("key_b")
    val iMenA = pairs.schema.fieldIndex("mention_a")
    val iMenB = pairs.schema.fieldIndex("mention_b")
    val iVecA = if (hasVecs) pairs.schema.fieldIndex("vec_a") else -1
    val iVecB = if (hasVecs) pairs.schema.fieldIndex("vec_b") else -1
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
      def vecAt(r: Row, i: Int, fallback: String): Array[Float] =
        if (i >= 0 && !r.isNullAt(i)) {
          val seq = r.getSeq[Float](i)
          val out = new Array[Float](seq.length)
          var j = 0
          while (j < out.length) { out(j) = seq(j); j += 1 }
          out
        } else embed(fallback)
      rows.map { r =>
        def s(i: Int): String = if (r.isNullAt(i)) "" else r.getString(i)
        val keyA = s(iKeyA); val keyB = s(iKeyB)
        val menA = s(iMenA); val menB = s(iMenB)
        val comboKey = keyA + "" + keyB + "" + menA + "" + menB
        var v = comboMemo.get(comboKey)
        if (v == null) {
          val (keySim, jw, cos, combined) =
            score(keyA, keyB, menA, menB, vecAt(r, iVecA, menA), vecAt(r, iVecB, menB), w)
          v = Array(keySim, jw, cos, combined)
          if (comboMemo.size < memoCap) comboMemo.put(comboKey, v)
        }
        Row.fromSeq(keptIdx.map(r.get).toSeq ++ Seq(v(0), v(1), v(2), v(3)))
      }
    }(encoder)
  }

  private val simFields = Seq(
    StructField("key_sim", DoubleType), StructField("jw_sim", DoubleType),
    StructField("cos_sim", DoubleType), StructField("score", DoubleType))

  private val leanSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)) ++ simFields)

  private val wideSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("key_a", StringType), StructField("key_b", StringType),
    StructField("mention_a", StringType), StructField("mention_b", StringType)) ++ simFields)

  /** Kernel-fused scoring over a bucket-member table
    * (`PairGen.saltedBucketTable`): pair enumeration AND scoring run in one
    * mapPartitions pass, so the quadratic pair stream is never a relational
    * intermediate — no per-pair struct construction in the plan, no pair-row
    * shuffle, and member payloads (strings, embedding vectors) are decoded
    * once per member instead of once per pair. Pairs are oriented src > dst
    * by sorting members on descending mention_id, making output rows
    * independent of collect_list order (parallelism-invariant). */
  def scoreBuckets(buckets: DataFrame, w: Weights = Weights(),
      embedder: Embedder = Embedder.default, carryFeatures: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.ArrayType
    val msIdx = buckets.schema.fieldIndex("ms")
    val memberSchema = buckets.schema(msIdx).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val iId = memberSchema.fieldIndex("mention_id")
    val iKey = memberSchema.fieldIndex("blocking_key")
    val iMen = memberSchema.fieldIndex("mention")
    val iVec = if (memberSchema.fieldNames.contains("vec")) memberSchema.fieldIndex("vec") else -1
    // lean output (ids + sims, fixed-width UnsafeRows) is the default: at
    // ~10^9 pairs the per-pair string copies into UnsafeRows are a memory-
    // bandwidth bottleneck that serializes wide fan-out; features rejoin via
    // mention_id when needed
    val encoder = org.apache.spark.sql.Encoders.row(if (carryFeatures) wideSchema else leanSchema)
    val nOut = if (carryFeatures) 10 else 6
    buckets.mapPartitions { rows =>
      val embMemo = new java.util.HashMap[String, Array[Float]](1024)
      val comboMemo = new java.util.HashMap[String, Array[Double]](4096)
      val surfPairMemo = new java.util.HashMap[String, Array[Double]](4096)
      val memoCap = 200000
      def embed(s: String): Array[Float] = {
        var v = embMemo.get(s)
        if (v == null) {
          v = embedder.encode(s)
          if (embMemo.size < memoCap) embMemo.put(s, v)
        }
        v
      }
      rows.flatMap { r =>
        val ms = r.getSeq[Row](msIdx)
        val n = ms.length
        // decode once per member; sort desc by id so pair (i,j), i<j is (src,dst)
        val sorted = ms.toArray.sortBy(m => -m.getLong(iId))
        val ids = new Array[Long](n)
        val keys = new Array[String](n)
        val mens = new Array[String](n)
        val vecs = new Array[Array[Float]](n)
        var sameKey = true
        var k = 0
        while (k < n) {
          val m = sorted(k)
          ids(k) = m.getLong(iId)
          keys(k) = if (m.isNullAt(iKey)) "" else m.getString(iKey)
          mens(k) = if (m.isNullAt(iMen)) "" else m.getString(iMen)
          vecs(k) =
            if (iVec >= 0 && !m.isNullAt(iVec)) {
              val sq = m.getSeq[Float](iVec)
              val a = new Array[Float](sq.length)
              var q = 0
              while (q < a.length) { a(q) = sq(q); q += 1 }
              a
            } else null
          if (k > 0 && keys(k) != keys(0)) sameKey = false
          k += 1
        }
        val base = new scala.collection.AbstractIterator[Row] {
          private val vals = new Array[Any](nOut)
          private val row = new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
          private var i = 0
          private var j = 1
          // Salted buckets are single-key by construction: key_sim and the
          // combined score are the constant 1.0 (identical canonical keys are
          // the reference's own equality predicate), and jw/cos depend only
          // on the SURFACE pair — so distinct surfaces are interned and a
          // d x d sim matrix is scored once; each of the C(n,2) emitted pairs
          // is then pure index lookups + a fixed-width row write. This is
          // what keeps 10^9-pair fan-out memory-bandwidth-light.
          private val singleKey = sameKey && n > 0 && keys(0).nonEmpty
          private val surfOf = new Array[Int](n)
          private var jwM: Array[Array[Double]] = null
          private var cosM: Array[Array[Double]] = null
          if (singleKey) {
            val surfMap = new java.util.HashMap[String, Integer](16)
            val surfs = new scala.collection.mutable.ArrayBuffer[String](8)
            val surfVecs = new scala.collection.mutable.ArrayBuffer[Array[Float]](8)
            var t = 0
            while (t < n) {
              var si = surfMap.get(mens(t))
              if (si == null) {
                si = Integer.valueOf(surfs.length)
                surfMap.put(mens(t), si)
                surfs += mens(t)
                surfVecs += (if (vecs(t) != null) vecs(t) else embed(mens(t)))
              }
              surfOf(t) = si.intValue()
              t += 1
            }
            val d = surfs.length
            jwM = Array.ofDim[Double](d, d)
            cosM = Array.ofDim[Double](d, d)
            var x = 0
            while (x < d) {
              var y = x
              while (y < d) {
                val ck = surfs(x) + "\u0001" + surfs(y)
                var v = surfPairMemo.get(ck)
                if (v == null) {
                  v = Array(
                    Similarity.jaroWinkler(surfs(x).toLowerCase, surfs(y).toLowerCase),
                    Similarity.dot(surfVecs(x), surfVecs(y)))
                  if (surfPairMemo.size < memoCap) surfPairMemo.put(ck, v)
                }
                jwM(x)(y) = v(0); jwM(y)(x) = v(0)
                cosM(x)(y) = v(1); cosM(y)(x) = v(1)
                y += 1
              }
              x += 1
            }
          }
          override def hasNext: Boolean = i < n - 1 && j < n
          override def next(): Row = {
            val ii = i; val jj = j
            j += 1
            if (j >= n) { i += 1; j = i + 1 }
            vals(0) = ids(ii); vals(1) = ids(jj)
            var o = 2
            if (carryFeatures) {
              vals(2) = keys(ii); vals(3) = keys(jj); vals(4) = mens(ii); vals(5) = mens(jj)
              o = 6
            }
            if (singleKey) {
              vals(o) = 1.0
              vals(o + 1) = jwM(surfOf(ii))(surfOf(jj))
              vals(o + 2) = cosM(surfOf(ii))(surfOf(jj))
              vals(o + 3) = 1.0
            } else {
              val ck = keys(ii) + "\u0001" + keys(jj) + "\u0001" + mens(ii) + "\u0001" + mens(jj)
              var v = comboMemo.get(ck)
              if (v == null) {
                val (keySim, jw, cos, combined) = score(keys(ii), keys(jj), mens(ii), mens(jj),
                  if (vecs(ii) != null) vecs(ii) else embed(mens(ii)),
                  if (vecs(jj) != null) vecs(jj) else embed(mens(jj)), w)
                v = Array(keySim, jw, cos, combined)
                if (comboMemo.size < memoCap) comboMemo.put(ck, v)
              }
              vals(o) = v(0); vals(o + 1) = v(1); vals(o + 2) = v(2); vals(o + 3) = v(3)
            }
            row
          }
        }
        base.filter(r => r.getLong(0) != r.getLong(1))
      }
    }(encoder)
  }

  /** Full fused candidate scoring: salted buckets through the bucket kernel,
    * the sparse chain + LSH pairs through the row kernel. Produces the same
    * pair set as `scorePairs(PairGen.candidatePairsWithFeatures(...))` with
    * one less relational materialization of the quadratic stream. */
  def scoreCandidates(mentions: DataFrame,
      cfg: pkel.blocking.PairGen.Config = pkel.blocking.PairGen.Config(),
      w: Weights = Weights(), embedder: Embedder = Embedder.default,
      carryFeatures: Boolean = false): DataFrame = {
    val bucketScored = scoreBuckets(
      pkel.blocking.PairGen.saltedBucketTable(mentions, cfg), w, embedder, carryFeatures)
    val sparseScored = scorePairs(
      pkel.blocking.PairGen.sparsePairsWithFeatures(mentions, cfg), w, embedder)
    val sparseAligned =
      if (carryFeatures) sparseScored
      else sparseScored.select("src", "dst", "key_sim", "jw_sim", "cos_sim", "score")
    bucketScored.unionByName(sparseAligned)
  }
}
