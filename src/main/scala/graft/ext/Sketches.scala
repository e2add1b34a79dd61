package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (k-minimum-values) distinct-count sketch — the bounded-memory
 * answer to `count(DISTINCT x)` at corpus scale (Bar-Yossef et al.,
 * "Counting distinct elements in a data stream", RANDOM'02).
 *
 * `count(DISTINCT)` needs a full dedup shuffle of every distinct value;
 * a KMV sketch keeps only the `k` smallest distinct 64-bit hashes — a
 * few KB per group, mergeable with a set union — so the whole aggregate
 * runs as an ordinary partial/final hash aggregation: map-side sketches,
 * one small shuffle of k-bounded buffers, no expand, no second job.
 *
 * Estimator: with hashes mapped to the unit interval, the k-th smallest
 * of n distinct uniform draws sits near k/n, so n̂ = (k−1)/u₍ₖ₎ (the
 * unbiased form); relative error ≈ 1/√(k−2). When fewer than `k`
 * distinct hashes were seen the sketch holds ALL of them and the count
 * is exact — which also makes the estimate deterministic and
 * partitioning-independent in both regimes: the k-smallest-distinct
 * set is a pure function of the input SET.
 *
 * 64-bit hash collisions undercount by ~n²/2⁶⁵ — the same accepted
 * trade every hashed-dedup operator here makes (`TextHash.scala`).
 */
object Kmv {
  /** Buffer: the `k` smallest distinct hashes, stored sign-flipped
   *  (`h ^ Long.MinValue`) so natural ordering equals the unsigned
   *  order the estimator needs. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def insert(h: Long): Unit = {
      val flipped = h ^ Long.MinValue
      if (set.size < k) { set.add(flipped); () }
      else if (flipped < set.last && set.add(flipped)) { set.pollLast(); () }
    }
    def mergeFrom(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) {
        val f = it.next().longValue()
        if (set.size < k) { set.add(f); () }
        else if (f < set.last && set.add(f)) { set.pollLast(); () }
        else ()
      }
    }
    def estimate: Long =
      if (set.size < k) set.size.toLong
      else {
        // u_k in (0,1): unsigned value of the k-th smallest hash / 2^64
        val uk = (set.last.toDouble + 9.223372036854776e18) / 1.8446744073709552e19
        math.round((k - 1) / uk)
      }
  }
}

/**
 * `kmv_distinct(x, k)`: approximate `count(DISTINCT x)` with k-bounded
 * state; exact while a group's distinct count stays under `k`.
 * Accepts integral and string inputs (hashed with XXH64).
 */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] {

  private val Seed = 0x9E3779B97F4A7C15L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 16 => TypeCheckResult.TypeCheckFailure(s"k=$k too small (min 16)")
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs an integral or string column, got ${t.sql}")
  }

  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(k)

  override def update(b: Kmv.Buffer, row: InternalRow): Kmv.Buffer = {
    val v = child.eval(row)
    if (v != null) {
      val h = v match {
        case s: UTF8String =>
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        case n: Number => XXH64.hashLong(n.longValue(), Seed)
      }
      b.insert(h)
    }
    b
  }

  override def merge(b: Kmv.Buffer, other: Kmv.Buffer): Kmv.Buffer = {
    b.mergeFrom(other); b
  }

  override def eval(b: Kmv.Buffer): Any = b.estimate

  override def serialize(b: Kmv.Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.set.size)
    buf.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next().longValue())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new Kmv.Buffer(k)
    var i = 0
    while (i < n) { b.set.add(buf.getLong); i += 1 }
    b
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kmv_distinct"
}
