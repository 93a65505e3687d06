package pkel.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Shared md5-derived unsigned 64-bit hash (first 16 hex chars of md5) —
  * the battery's oracle-friendly hash family: DuckDB computes the identical
  * value as `('0x' || substr(md5(s), 1, 16))::UBIGINT`. */
object Md5Hash {
  def long64(s: String): Long =
    java.lang.Long.parseUnsignedLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 16), 16)
}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the mergeable-sketch shape a 100 TB count
  * needs: each partition keeps only the k smallest distinct hashes (O(k)
  * state), partial buffers merge by set-union-and-trim, and the estimate is
  * (k-1)/u_k where u_k is the k-th minimum mapped to [0,1). With fewer than
  * k distinct values the count is exact.
  *
  * Deterministic by construction (md5 hashing, no RNG), so unlike HLL the
  * result is reproducible across engines — the DuckDB oracle computes the
  * identical estimate from the same hash family. Mirrors the approach of
  * sketch libraries' theta/KMV estimators; implemented from the standard
  * estimator formula.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  private def newSet(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] = newSet()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) buf.add(h)
    else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, Md5Hash.long64(v.toString))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long], other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // u_k in [0,1): top 53 bits of the unsigned k-th minimum, exactly
      // representable as a double (identical arithmetic in the SQL oracle)
      val u = (buf.last().longValue() >>> 11).toDouble / 9007199254740992.0 // 2^53
      if (u == 0.0) buf.size.toLong else math.floor((k - 1).toDouble / u).toLong
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newSet()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
