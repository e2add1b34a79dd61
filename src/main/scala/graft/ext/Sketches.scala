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
    /** Single add-or-evict path shared by update, merge, deserialize. */
    def insertFlipped(f: Long): Unit = {
      if (set.size < k) { set.add(f); () }
      else if (f < set.last && set.add(f)) { set.pollLast(); () }
    }
    def insert(h: Long): Unit = insertFlipped(h ^ Long.MinValue)
    def mergeFrom(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) insertFlipped(it.next().longValue())
    }
    def estimate: Long =
      if (set.size < k) set.size.toLong
      else {
        // u_k in (0,1): unsigned value of the k-th smallest hash / 2^64
        val uk = (set.last.toDouble + 9.223372036854776e18) / 1.8446744073709552e19
        math.round((k - 1) / uk)
      }
  }

  /** Wire-format tag: rejects foreign or pre-k-bearing blobs LOUDLY —
   *  without it, bytes in any other layout can misparse into a
   *  silently-empty or truncated buffer and undercount. */
  private val Magic = 0x4B4D5631 // "KMV1"

  /** Canonical wire form: magic, `k`, size, then the sorted flipped
   *  hashes. `k` travels IN the bytes so a stored state remembers the
   *  capacity it was built with — without it, merging a k=256 state
   *  under a k=4096 server deserializes into an under-filled buffer,
   *  hits the exact branch of [[Buffer.estimate]], and silently
   *  reports ~k instead of ~n. */
  def serialize(b: Buffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + 8 * b.set.size)
    buf.putInt(Magic)
    buf.putInt(b.k)
    buf.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next().longValue())
    buf.array()
  }

  /** Inverse of [[serialize]]: the buffer comes back with its OWN k. */
  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= 12 && buf.getInt == Magic,
      "not a kmv_state blob (bad magic): the column does not hold states " +
        "serialized by this release's kmv_state — foreign bytes, or a " +
        "legacy pre-header blob; rebuild the stored states")
    val k = buf.getInt
    val n = buf.getInt
    val b = new Buffer(k)
    var i = 0
    while (i < n) { b.insertFlipped(buf.getLong); i += 1 }
    b
  }
}

/**
 * SpaceSaving frequent-items sketch (Metwally et al., "Efficient
 * computation of frequent and top-k elements in data streams",
 * ICDT'05) — the bounded-memory answer to "top tokens by count" over a
 * corpus too wide to hold exact counts per group.
 *
 * The summary keeps at most `capacity` (item, count, err) entries; an
 * unseen item arriving at a full summary replaces the current minimum,
 * inheriting its count as overestimation error. Summaries merge by
 * summing counts and trimming back to capacity (Agarwal et al.,
 * "Mergeable summaries", PODS'12), so the aggregate runs partial/final
 * like any hash aggregation. While a group's distinct-item count stays
 * under `capacity` nothing is ever evicted: counts are exact, `err` is
 * 0 everywhere, and the output is the deterministic exact top list —
 * the declared query's regime.
 */
object SpaceSaving {
  /** count index (TreeMap count → TreeSet of items) makes eviction
   *  O(log m) AND deterministic: among minimum-count entries the
   *  lexicographically smallest item is evicted, and merges replay the
   *  other summary in sorted-item order — so the retained set is a
   *  function of the data and merge tree, never of JVM hash iteration
   *  order. (The merge TREE itself — which partial buffers combine
   *  first — still follows shuffle arrival order; eviction-free
   *  [exact-regime] summaries are fully order-independent.) */
  final class Buffer(val capacity: Int) {
    val counts = new java.util.HashMap[String, Long]()
    val errs = new java.util.HashMap[String, Long]()
    private val byCount = new java.util.TreeMap[Long, java.util.TreeSet[String]]()

    private def index(item: String, c: Long): Unit = {
      val s = byCount.computeIfAbsent(c, _ => new java.util.TreeSet[String]())
      s.add(item); ()
    }
    private def unindex(item: String, c: Long): Unit = {
      val s = byCount.get(c)
      if (s != null) { s.remove(item); if (s.isEmpty) { byCount.remove(c); () } }
    }

    def add(item: String, by: Long, err: Long): Unit = {
      val cur = counts.get(item)
      if (counts.containsKey(item)) {
        unindex(item, cur)
        counts.put(item, cur + by)
        errs.put(item, errs.get(item) + err)
        index(item, cur + by)
      } else if (counts.size < capacity) {
        counts.put(item, by); errs.put(item, err); index(item, by)
      } else {
        // evict the minimum (ties: lexicographically smallest item —
        // deterministic); the newcomer inherits its count as error
        val minEntry = byCount.firstEntry()
        val victim = minEntry.getValue.first()
        val minCount = minEntry.getKey
        unindex(victim, minCount)
        counts.remove(victim); errs.remove(victim)
        counts.put(item, minCount + by)
        errs.put(item, minCount + err)
        index(item, minCount + by)
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      // sorted-item replay: HashMap iteration order would make the
      // over-capacity eviction sequence depend on JVM hashing
      val items = new java.util.TreeMap[String, Long](other.counts)
      val it = items.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(e.getKey, e.getValue, other.errs.get(e.getKey))
      }
    }

    /** Top `k` by (count desc, item asc) — deterministic in the exact
     *  regime (the tie-break is total). */
    def top(k: Int): Seq[(String, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue.longValue(), errs.get(e.getKey).longValue()))
        .sortBy { case (item, c, _) => (-c, item) }
        .take(k)
    }
  }
}

/**
 * `approx_top_items(x, capacity, k)`: the `k` most frequent values of
 * `x` as `array<struct<item string, cnt bigint, err bigint>>`, with
 * `capacity`-bounded state. `err` is each count's maximum
 * overestimation — 0 while the group's distinct count stays under
 * `capacity` (then the result is the exact top-k).
 */
case class ApproxTopItems(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if capacity < 16 => TypeCheckResult.TypeCheckFailure(
      s"capacity=$capacity too small (min 16)")
    case _ if k < 1 || k > capacity => TypeCheckResult.TypeCheckFailure(
      s"k=$k must be in [1, capacity=$capacity]")
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"approx_top_items needs a string or integral column, got ${t.sql}")
  }

  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer(capacity)

  override def update(b: SpaceSaving.Buffer, row: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.toString, 1L, 0L)
    b
  }

  override def merge(b: SpaceSaving.Buffer, o: SpaceSaving.Buffer): SpaceSaving.Buffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: SpaceSaving.Buffer): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    new GenericArrayData(b.top(k).map { case (item, c, err) =>
      InternalRow(UTF8String.fromString(item), c, err)
    }.toArray[Any])
  }

  override def serialize(b: SpaceSaving.Buffer): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    // all entries in map order — no sort; the deserializer re-adds them
    val items = b.counts.entrySet().asScala.toSeq.map(e =>
      (e.getKey, e.getValue.longValue(), b.errs.get(e.getKey).longValue()))
    val bytes = items.map(_._1.getBytes("UTF-8"))
    val buf = ByteBuffer.allocate(4 + bytes.map(4 + 16 + _.length).sum)
    buf.putInt(items.size)
    items.zip(bytes).foreach { case ((_, c, err), ib) =>
      buf.putInt(ib.length); buf.put(ib); buf.putLong(c); buf.putLong(err)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new SpaceSaving.Buffer(capacity)
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val ib = new Array[Byte](len)
      buf.get(ib)
      b.add(new String(ib, "UTF-8"), buf.getLong, buf.getLong)
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ApproxTopItems =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): ApproxTopItems =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxTopItems =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "approx_top_items"
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

  override def serialize(b: Kmv.Buffer): Array[Byte] = Kmv.serialize(b)

  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.deserialize(bytes)

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

/**
 * `kmv_state(x, k)`: the [[KmvDistinct]] sketch evaluated to its
 * SERIALIZED buffer (binary) instead of the estimate — the STORE step
 * of incremental corpus profiling: per-group sketch states persist as
 * an ordinary table column and later merge with fresh partials
 * ([[KmvMergeDistinct]] / [[KmvMergeState]]), so corpus-wide distinct
 * counts extend batch-by-batch without ever rescanning history — the
 * pre-aggregated-cube pattern (Agarwal et al., "Mergeable summaries",
 * PODS'12). The buffer is the k smallest distinct hashes in a sorted
 * set — a pure function of the input SET — so the state bytes are
 * canonical: store-then-merge is bit-identical to one full-corpus pass
 * regardless of batch split or partitioning.
 */
case class KmvState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] {

  private lazy val base = KmvDistinct(child, k)

  override def checkInputDataTypes(): TypeCheckResult = base.checkInputDataTypes()
  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(k)
  override def update(b: Kmv.Buffer, row: InternalRow): Kmv.Buffer = base.update(b, row)
  override def merge(b: Kmv.Buffer, o: Kmv.Buffer): Kmv.Buffer = base.merge(b, o)
  override def eval(b: Kmv.Buffer): Any = base.serialize(b)
  override def serialize(b: Kmv.Buffer): Array[Byte] = base.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = base.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvState =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvState =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kmv_state"
}

/** Shared shape of the two KMV state-merging aggregates: the input
 *  column holds SERIALIZED [[Kmv.Buffer]]s ([[KmvState]] output). */
sealed trait KmvMergeLike extends TypedImperativeAggregate[Kmv.Buffer] {
  def child: Expression
  def k: Int
  protected lazy val base: KmvDistinct = KmvDistinct(child, k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 16 => TypeCheckResult.TypeCheckFailure(s"k=$k too small (min 16)")
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary kmv_state column, got ${t.sql}")
  }
  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(k)
  override def update(b: Kmv.Buffer, row: InternalRow): Kmv.Buffer = {
    val v = child.eval(row)
    if (v != null) {
      val st = Kmv.deserialize(v.asInstanceOf[Array[Byte]])
      // a SATURATED state built with a smaller k holds only its k
      // smallest hashes: served under a larger k the union under-fills
      // the buffer, hits the exact branch of the estimator, and reports
      // ~storedK instead of ~n — fail loudly rather than return a
      // silently wrong count. An UNSATURATED smaller-k state holds its
      // input set exactly and merges safely under any serving k.
      if (st.k < k && st.set.size >= st.k) throw new IllegalArgumentException(
        s"$prettyName(k=$k) over a SATURATED state built with k=${st.k}: a " +
          "saturated state cannot serve a larger k; rebuild the states or lower k")
      b.mergeFrom(st)
    }
    b
  }
  override def merge(b: Kmv.Buffer, o: Kmv.Buffer): Kmv.Buffer = { b.mergeFrom(o); b }
  override def serialize(b: Kmv.Buffer): Array[Byte] = Kmv.serialize(b)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.deserialize(bytes)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
}

/** `kmv_merge(state, k)`: union stored [[KmvState]] buffers back into a
 *  distinct-count estimate — the SERVE step of incremental profiling.
 *  Exact whenever the union holds fewer than `k` hashes. */
case class KmvMergeDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvMergeLike {
  override def eval(b: Kmv.Buffer): Any = b.estimate
  override def dataType: DataType = LongType
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeDistinct =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeDistinct =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kmv_merge"
}

/** `kmv_merge_state(state, k)`: union stored states into a NEW state —
 *  the rollup step (day → month → total) of a sketch cube. */
case class KmvMergeState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvMergeLike {
  override def eval(b: Kmv.Buffer): Any = base.serialize(b)
  override def dataType: DataType = BinaryType
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeState =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeState =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kmv_merge_state"
}

/** `top_items_state(x, capacity)`: [[ApproxTopItems]] evaluated to its
 *  serialized summary (binary) — the STORE step for frequent-items
 *  cubes; merge stored states with [[TopItemsMerge]]. Counts stay exact
 *  (err 0) while every contributing group's distinct-item count fits
 *  `capacity` — the mergeable-summaries guarantee. */
case class TopItemsState(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer] {

  private lazy val base = ApproxTopItems(child, capacity, 1)

  override def checkInputDataTypes(): TypeCheckResult = base.checkInputDataTypes()
  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer(capacity)
  override def update(b: SpaceSaving.Buffer, row: InternalRow): SpaceSaving.Buffer =
    base.update(b, row)
  override def merge(b: SpaceSaving.Buffer, o: SpaceSaving.Buffer): SpaceSaving.Buffer =
    base.merge(b, o)
  override def eval(b: SpaceSaving.Buffer): Any = base.serialize(b)
  override def serialize(b: SpaceSaving.Buffer): Array[Byte] = base.serialize(b)
  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer = base.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopItemsState =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopItemsState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopItemsState =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "top_items_state"
}

/** `top_items_merge(state, capacity, j)`: merge stored [[TopItemsState]]
 *  summaries and emit the top `j` items — the SERVE step; same output
 *  shape as [[ApproxTopItems]]. */
case class TopItemsMerge(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buffer] {

  private lazy val base = ApproxTopItems(child, capacity, k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if capacity < 16 => TypeCheckResult.TypeCheckFailure(
      s"capacity=$capacity too small (min 16)")
    case _ if k < 1 || k > capacity => TypeCheckResult.TypeCheckFailure(
      s"k=$k must be in [1, capacity=$capacity]")
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_items_merge needs a binary top_items_state column, got ${t.sql}")
  }
  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer(capacity)
  override def update(b: SpaceSaving.Buffer, row: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(row)
    if (v != null) b.mergeFrom(base.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: SpaceSaving.Buffer, o: SpaceSaving.Buffer): SpaceSaving.Buffer = {
    b.mergeFrom(o); b
  }
  override def eval(b: SpaceSaving.Buffer): Any = base.eval(b)
  override def serialize(b: SpaceSaving.Buffer): Array[Byte] = base.serialize(b)
  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer = base.deserialize(bytes)
  override def dataType: DataType = base.dataType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopItemsMerge =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopItemsMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopItemsMerge =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "top_items_merge"
}
