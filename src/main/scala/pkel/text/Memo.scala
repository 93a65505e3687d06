package pkel.text

/** Per-task bounded memo around a pure `String => T` kernel.
  *
  * Transcript corpora repeat mention surfaces massively (millions of rows
  * over thousands of distinct surfaces), so the regex-chain kernels
  * ([[PkTokenizer]], the NIL patterns) need to run once per distinct surface
  * per task, not once per row. The memo lives behind `@transient lazy val`:
  * each Spark task deserializes its own closure instance and builds a fresh
  * map on first use — single-threaded within the task, never shared across
  * tasks, and absent from the serialized closure. Bounded so a worst-case
  * all-unique corpus keeps memory flat and degrades to the unmemoized cost
  * (same discipline as PairScorer.MemoCap).
  */
final class Memo[T](f: String => T, cap: Int = Memo.DefaultCap)
    extends (String => T) with Serializable {
  @transient private lazy val memo = new java.util.HashMap[String, AnyRef](1024)
  def apply(s: String): T = {
    val hit = memo.get(s)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val v = f(s)
      // null results stay unmemoized (treated as a miss every time); the
      // kernels wrapped here never return null
      if (memo.size < cap && v != null) memo.put(s, v.asInstanceOf[AnyRef])
      v
    }
  }
}

object Memo {
  /** ~200k surfaces × (pointer + boxed value) keeps the per-task map well
    * under typical executor headroom. */
  val DefaultCap = 200000
  def apply[T](f: String => T, cap: Int = DefaultCap): String => T = new Memo(f, cap)
}
