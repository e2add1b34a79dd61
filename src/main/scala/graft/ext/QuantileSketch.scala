package graft.ext

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Mergeable quantile sketch — the 100 TB face of `percentile_cont`/
 * `percentile_disc`: Spark's exact percentile aggregate buffers EVERY
 * value per group (unbounded state, one giant sort per group), which is
 * the one aggregate shape that cannot ride a partial/final hash
 * aggregation at corpus scale. This sketch keeps k-bounded state per
 * group and merges like any other buffer, so map-side partials combine
 * and only k·log(n/k) doubles ever shuffle — completing the sketch
 * family next to KMV (distinct count) and SpaceSaving (frequent items),
 * with the same store/merge/serve flow.
 *
 * Structure: a KLL-style compactor hierarchy (Karnin, Lang, Liberty —
 * "Optimal quantile approximation in streams", FOCS'16; lineage back to
 * Manku-Rajagopalan-Lindsay's collapsing buffers, SIGMOD'98). Level `i`
 * holds items of weight 2^i, capacity `k` each. An over-full level
 * sorts, promotes every other item (alternating start parity per
 * compaction — DETERMINISTIC, no RNG: the classic MRL derandomization;
 * KLL's random coin buys a √log factor in the proof, not correctness)
 * to the level above, and the unpaired odd item stays behind, so total
 * weight is conserved exactly and each compaction perturbs any rank by
 * at most half the level weight.
 *
 * Regimes, mirroring the KMV contract:
 *  - EXACT while a group's value count stays ≤ k: nothing ever
 *    compacts, the state is the full sorted multiset (canonical bytes —
 *    a pure function of the input multiset, independent of
 *    partitioning and merge order), and the served quantile equals
 *    `percentile_disc`: the smallest value whose cumulative count
 *    reaches q·n.
 *  - ESTIMATOR above k: rank error grows like (n/k)·log(n/k) in the
 *    worst case (deterministic-compaction bound; ExtSpec pins an
 *    empirical envelope), state stays O(k·log(n/k)) doubles. Estimator
 *    states are NOT canonical across merge trees — only the exact
 *    regime promises bit-identical store-then-merge, exactly like the
 *    SpaceSaving exact-regime guarantee.
 *
 * Quantile rule (both regimes): smallest value v with
 * `weight({x ≤ v}) ≥ q · totalWeight`, the comparison done in IEEE
 * double — replayable verbatim by any engine with a window function,
 * which is what the declared query's oracle does.
 */
object Qsketch {

  final class Buffer(val k: Int) {
    /** levels(i): items of weight 2^i; only level 0 receives inserts. */
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    /** Per-level compaction parity; flips each compaction so promoted
     *  positions alternate (the derandomized coin). */
    val parities: ArrayBuffer[Boolean] = ArrayBuffer(false)

    private def ensureLevel(i: Int): Unit =
      while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; parities += false }

    def insert(v: Double): Unit = { levels(0) += v; compactAll() }

    def mergeFrom(other: Buffer): Unit = {
      ensureLevel(other.levels.size - 1)
      var i = 0
      while (i < other.levels.size) { levels(i) ++= other.levels(i); i += 1 }
      // parities deliberately NOT merged: they are private compaction
      // state, not data; this buffer keeps its own alternation
      compactAll()
    }

    /** One bottom-up sweep; promoting into i+1 is re-checked when the
     *  sweep reaches it, so a cascade settles in a single pass. */
    private def compactAll(): Unit = {
      var i = 0
      while (i < levels.size) {
        if (levels(i).size > k) compactLevel(i)
        i += 1
      }
    }

    private def compactLevel(i: Int): Unit = {
      ensureLevel(i + 1)
      val sorted = levels(i).sorted
      // odd count: the max stays behind un-promoted (weight conserved)
      val evenCount = sorted.size - (sorted.size % 2)
      val start = if (parities(i)) 1 else 0
      parities(i) = !parities(i)
      val promoted = new ArrayBuffer[Double](evenCount / 2)
      var j = start
      while (j < evenCount) { promoted += sorted(j); j += 2 }
      val behind = new ArrayBuffer[Double](sorted.size % 2)
      if (sorted.size % 2 == 1) behind += sorted.last
      levels(i) = behind
      levels(i + 1) ++= promoted
    }

    def totalWeight: Long = {
      var w = 0L
      var i = 0
      while (i < levels.size) { w += levels(i).size.toLong << i; i += 1 }
      w
    }

    /** Smallest v with cumulative weight ≥ q·total (IEEE comparison);
     *  None on an empty buffer. */
    def quantile(q: Double): Option[Double] = quantiles(Seq(q)).map(_.head)

    /** [[quantile]] for SEVERAL probabilities from ONE sort + ONE
     *  cumulative sweep — the profiling shape (p25/p50/p75/p99 of the
     *  same column) without re-walking the buffer per quantile. Results
     *  align positionally with `qs` (any order). */
    def quantiles(qs: Seq[Double]): Option[Seq[Double]] = {
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.size) {
        val w = 1L << i
        levels(i).foreach(v => items += ((v, w)))
        i += 1
      }
      if (items.isEmpty) return None
      val sorted = items.sortBy(_._1)
      val total = totalWeight
      // one sweep serves every target: process probabilities in
      // ascending-target order, advancing the cumulative pointer
      val order = qs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](qs.size)
      var cum = 0L
      var idx = -1 // index of the last item folded into cum
      order.foreach { case (q, oi) =>
        val target = q * total.toDouble
        while (cum.toDouble < target && idx < sorted.size - 1) {
          idx += 1
          cum += sorted(idx)._2
        }
        out(oi) = sorted(math.max(idx, 0))._1
      }
      Some(out.toSeq)
    }
  }

  /** Wire-format tag — foreign bytes must fail loudly (the KMV rule). */
  private val Magic = 0x51534B31 // "QSK1"

  /** Canonical wire form: magic, k, level count, then per level its
   *  parity, count, and SORTED values. Sorting on serialize makes the
   *  exact-regime bytes a pure function of the input multiset. */
  def serialize(b: Buffer): Array[Byte] = {
    val nItems = b.levels.map(_.size).sum
    val buf = ByteBuffer.allocate(12 + b.levels.size * 5 + 8 * nItems)
    buf.putInt(Magic)
    buf.putInt(b.k)
    buf.putInt(b.levels.size)
    b.levels.zip(b.parities).foreach { case (lvl, p) =>
      buf.put(if (p) 1.toByte else 0.toByte)
      buf.putInt(lvl.size)
      lvl.sorted.foreach(buf.putDouble)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    require(bytes.length >= 12 && buf.getInt == Magic,
      "not a quantile_state blob (bad magic): the column does not hold " +
        "states serialized by quantile_state — rebuild the stored states")
    val k = buf.getInt
    val nLevels = buf.getInt
    val b = new Buffer(k)
    var i = 0
    while (i < nLevels) {
      if (b.levels.size <= i) { b.levels += ArrayBuffer.empty[Double]; b.parities += false }
      b.parities(i) = buf.get() == 1
      val n = buf.getInt
      var j = 0
      while (j < n) { b.levels(i) += buf.getDouble; j += 1 }
      i += 1
    }
    b
  }
}

/** Shared TypedImperativeAggregate plumbing for the four quantile-sketch
 *  faces (direct/state × quantile/state output). */
sealed trait QsketchAggLike extends TypedImperativeAggregate[Qsketch.Buffer] {
  def child: Expression
  def k: Int

  protected def checkK: Option[TypeCheckResult] =
    if (k < 16) Some(TypeCheckResult.TypeCheckFailure(s"k=$k too small (min 16)")) else None
  protected def checkQ(q: Double): Option[TypeCheckResult] =
    // negated-range form so NaN (which fails BOTH q < 0 and q > 1) is
    // rejected too, instead of silently serving the group minimum
    if (!(q >= 0.0 && q <= 1.0))
      Some(TypeCheckResult.TypeCheckFailure(s"quantile q=$q must be in [0, 1]"))
    else None

  override def createAggregationBuffer(): Qsketch.Buffer = new Qsketch.Buffer(k)
  override def merge(b: Qsketch.Buffer, o: Qsketch.Buffer): Qsketch.Buffer = {
    b.mergeFrom(o); b
  }
  override def serialize(b: Qsketch.Buffer): Array[Byte] = Qsketch.serialize(b)
  override def deserialize(bytes: Array[Byte]): Qsketch.Buffer = Qsketch.deserialize(bytes)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
}

/** Direct-input update: numeric values fold into the sketch as doubles
 *  (the served quantile is then a double from the value domain). */
sealed trait QsketchValueInput extends QsketchAggLike {
  override def checkInputDataTypes(): TypeCheckResult =
    checkK.getOrElse(child.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric column, got ${t.sql}")
    })
  override def update(b: Qsketch.Buffer, row: InternalRow): Qsketch.Buffer = {
    val v = child.eval(row)
    if (v != null) b.insert(v.asInstanceOf[Number].doubleValue())
    b
  }
}

/** State-input update: the child holds serialized [[Qsketch.Buffer]]s
 *  ([[QuantileState]] output); any stored k merges under any serving k
 *  (items are just weighted values — unlike KMV there is no
 *  capacity-dependent estimator cliff, the serving k only governs
 *  future compaction granularity). */
sealed trait QsketchStateInput extends QsketchAggLike {
  override def checkInputDataTypes(): TypeCheckResult =
    checkK.getOrElse(child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a binary quantile_state column, got ${t.sql}")
    })
  override def update(b: Qsketch.Buffer, row: InternalRow): Qsketch.Buffer = {
    val v = child.eval(row)
    if (v != null) b.mergeFrom(Qsketch.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
}

/** `quantile_sketch(x, k, q)`: the q-quantile of `x` with k-bounded
 *  state; equals `percentile_disc(q)` while the group holds ≤ k values. */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchValueInput {
  override def checkInputDataTypes(): TypeCheckResult =
    checkQ(q).getOrElse(super.checkInputDataTypes())
  override def eval(b: Qsketch.Buffer): Any = b.quantile(q).orNull
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_sketch"
}

/** `quantile_sketch_multi(x, array(q…), k)`: several quantiles of one
 *  column from ONE k-bounded sketch — the profiling shape (p25/p50/p75/
 *  p99 together) pays one buffer build and one sorted sweep instead of
 *  one aggregate per probability. Output aligns positionally with the
 *  probability array; NULL on an empty group. */
case class QuantileSketchMultiAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchValueInput {
  override def checkInputDataTypes(): TypeCheckResult =
    if (qs.isEmpty)
      TypeCheckResult.TypeCheckFailure("quantile_sketch_multi needs at least one q")
    else qs.flatMap(checkQ).headOption.getOrElse(super.checkInputDataTypes())
  override def eval(b: Qsketch.Buffer): Any =
    b.quantiles(qs)
      .map(vs => new org.apache.spark.sql.catalyst.util.GenericArrayData(
        vs.toArray[Any]))
      .orNull
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchMultiAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMultiAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMultiAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_sketch_multi"
}

/** `quantile_merge_multi(state, array(q…), k)`: [[QuantileSketchMultiAgg]]
 *  over STORED states — the one-pass serve step of a sketch cube. */
case class QuantileMergeMulti(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchStateInput {
  override def checkInputDataTypes(): TypeCheckResult =
    if (qs.isEmpty)
      TypeCheckResult.TypeCheckFailure("quantile_merge_multi needs at least one q")
    else qs.flatMap(checkQ).headOption.getOrElse(super.checkInputDataTypes())
  override def eval(b: Qsketch.Buffer): Any =
    b.quantiles(qs)
      .map(vs => new org.apache.spark.sql.catalyst.util.GenericArrayData(
        vs.toArray[Any]))
      .orNull
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileMergeMulti =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeMulti =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeMulti =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_merge_multi"
}

/** `quantile_state(x, k)`: the sketch as a persistable BINARY state —
 *  the STORE step; canonical bytes in the exact regime. */
case class QuantileState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchValueInput {
  override def eval(b: Qsketch.Buffer): Any = Qsketch.serialize(b)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileState =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileState =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_state"
}

/** `quantile_merge(state, k, q)`: union stored states back into a
 *  quantile — the SERVE step of incremental profiling. */
case class QuantileMergeQuantile(
    child: Expression,
    k: Int,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchStateInput {
  override def checkInputDataTypes(): TypeCheckResult =
    checkQ(q).getOrElse(super.checkInputDataTypes())
  override def eval(b: Qsketch.Buffer): Any = b.quantile(q).orNull
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileMergeQuantile =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeQuantile =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_merge"
}

/** `quantile_merge_state(state, k)`: union stored states into a NEW
 *  state — the rollup step (day → month → total) of a sketch cube. */
case class QuantileMergeState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QsketchStateInput {
  override def eval(b: Qsketch.Buffer): Any = Qsketch.serialize(b)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileMergeState =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantileMergeState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileMergeState =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "quantile_merge_state"
}
