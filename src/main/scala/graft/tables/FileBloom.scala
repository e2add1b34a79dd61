package graft.tables

import java.nio.ByteBuffer
import java.util.Base64

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.types._

/**
 * Manifest-level (file-granularity) Bloom filters — the commit-metadata
 * index role the reference gets from Hudi's bloom index
 * (`hoodie.index.type=BLOOM`, consulted before any file is opened).
 * The parquet bloom filters [[SnapshotTable.writeDataDir]] already
 * writes give ROW-GROUP skipping, but only after a task has been
 * scheduled and the footer read; at 100 TB a point lookup on a
 * hash-distributed key still schedules one task per live file. A
 * per-file filter carried in the commit manifest lets the PLANNER drop
 * files — no task, no footer read, no object-store GET.
 *
 * Layout: one filter per (file, column), built at commit time from the
 * just-written files (one extra scan of the indexed columns — the same
 * cost Hudi pays to maintain its bloom index), stored as
 * `k:m:<base64(longs)>` in [[SnapshotTable.FileEntry.blooms]], keyed by
 * LOGICAL column name like all commit metadata.
 *
 * Hashing: two XxHash64 passes over the column's CATALYST value with
 * fixed seeds, combined Kirsch-Mitzenmacher style (g_i = h1 + i·h2).
 * The read side ([[SnapshotTable.Pruning]]) converts its literal into
 * the same catalyst domain before hashing, so build and probe agree by
 * construction. NULLs are never added: an equality predicate cannot
 * match NULL.
 *
 * Sizing: ~10 bits/row (k=7 → ≈1% false-positive rate), capped by
 * `graft.bloom.manifest.maxbytes` (default 128 KiB per file per column)
 * so the manifest stays metadata-sized. Past the cap the filter
 * degrades gracefully to a higher false-positive rate — pruning weakens
 * but never turns wrong. Deployments with very large files raise the
 * cap or lean on the row-group filters underneath.
 */
private[graft] object FileBloom {

  val Seed1 = 0x9747b28cL
  val Seed2 = 0x2545f491L
  val DefaultK = 7
  val BitsPerKey = 10
  val DefaultMaxBytes: Long = 128L * 1024

  /** Filter size in bits for `rows` keys under `maxBytes`: a power of
   *  two near 10·rows, never above maxBytes·8 (the cap ROUNDS DOWN —
   *  `graft.bloom.manifest.maxbytes` is a hard manifest-size contract,
   *  not a hint), floored at 8192 bits (1 KiB). */
  def sizeBits(rows: Long, maxBytes: Long = DefaultMaxBytes): Int = {
    val want = math.max(8192L, rows * BitsPerKey)
    val capped = java.lang.Long.highestOneBit(math.max(8192L, maxBytes * 8))
    val grown = java.lang.Long.highestOneBit(want - 1) * 2 // next pow2 ≥ want
    math.min(math.min(grown, capped), Int.MaxValue / 2 + 1).toInt
  }

  /** File count that keeps per-file manifest blooms AT their FP design
   *  point (~[[BitsPerKey]] bits per key) under the `maxBytes` cap: at a
   *  FIXED file count, rows-per-file grow with the corpus, the capped
   *  filters saturate, and the false-positive rate — i.e. the number of
   *  files a selective probe reads for nothing — climbs with scale (an
   *  r11 scale-matrix row measured exactly that on the span-gram index:
   *  the all-novel serve drifted exp≈0.5 purely from FP files that had
   *  also grown 10×). Index builders take
   *  `max(requested, rows / (cap·8 / bitsPerKey))` so file count scales
   *  with the corpus and every file's bloom stays honest. */
  def bloomSizedFiles(
      requested: Int, rows: Long, maxBytes: Long = DefaultMaxBytes): Int = {
    val rowsPerFile = math.max(1L, maxBytes * 8L / BitsPerKey)
    math.max(requested, math.ceil(rows.toDouble / rowsPerFile).toInt)
  }

  def encode(bits: Array[Long], k: Int): String = {
    val bb = ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    s"$k:${bits.length * 64}:${Base64.getEncoder.encodeToString(bb.array())}"
  }

  /** (k, mBits, words) — None on any malformed input (treated by the
   *  read side as "no filter": pruning stays conservative). */
  def decode(s: String): Option[(Int, Int, Array[Long])] = {
    val parts = s.split(":", 3)
    if (parts.length != 3) return None
    try {
      val k = parts(0).toInt
      val m = parts(1).toInt
      val bytes = Base64.getDecoder.decode(parts(2))
      // m must be a whole number of words or probe indices in the last
      // partial word would walk off the array
      if (k < 1 || m < 64 || m % 64 != 0 || bytes.length * 8 != m) return None
      val bb = ByteBuffer.wrap(bytes)
      Some((k, m, Array.fill(m / 64)(bb.getLong)))
    } catch { case _: IllegalArgumentException | _: NumberFormatException => None }
  }

  /** The two hash passes over a catalyst-domain value of type `dt`. */
  def hashes(value: Any, dt: DataType): (Long, Long) =
    (XxHash64Function.hash(value, dt, Seed1), XxHash64Function.hash(value, dt, Seed2))

  @inline private def setBit(bits: Array[Long], idx: Int): Unit =
    bits(idx >>> 6) |= 1L << (idx & 63)

  @inline private def getBit(bits: Array[Long], idx: Int): Boolean =
    (bits(idx >>> 6) & (1L << (idx & 63))) != 0

  def add(bits: Array[Long], k: Int, h1: Long, h2: Long): Unit = {
    val m = bits.length * 64
    var i = 0
    while (i < k) {
      // mask to non-negative before modulo; m is a power of two
      setBit(bits, (((h1 + i * h2) & Long.MaxValue) % m).toInt)
      i += 1
    }
  }

  def mightContain(encoded: String, h1: Long, h2: Long): Boolean =
    decode(encoded) match {
      case None => true // unreadable filter: never prune on it
      case Some((k, m, bits)) => mightContainDecoded(k, m, bits, h1, h2)
    }

  /** Probe an already-decoded filter — callers probing many values
   *  against one filter (IN lists) decode once, not per value. */
  def mightContainDecoded(k: Int, m: Int, bits: Array[Long], h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      if (!getBit(bits, (((h1 + i * h2) & Long.MaxValue) % m).toInt)) return false
      i += 1
    }
    true
  }

  /** Catalyst-domain conversion of an external literal value for type
   *  `dt`, or None when the value can't represent in `dt` exactly (the
   *  caller then skips bloom pruning for that conjunct). Mirrors the
   *  domains [[hashes]] is fed on the build side, where values come
   *  straight out of InternalRows. */
  def catalystValue(value: Any, dt: DataType): Option[Any] = dt match {
    case StringType => value match {
      case s: String => Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u)
      case _ => None
    }
    case LongType => value match {
      case n: java.lang.Number if n.longValue() == n.doubleValue() => Some(n.longValue())
      case _ => None
    }
    case IntegerType => value match {
      case n: java.lang.Number if n.intValue().toDouble == n.doubleValue() =>
        Some(n.intValue())
      case _ => None
    }
    case ShortType => value match {
      case n: java.lang.Number if n.shortValue().toDouble == n.doubleValue() =>
        Some(n.shortValue())
      case _ => None
    }
    case ByteType => value match {
      case n: java.lang.Number if n.byteValue().toDouble == n.doubleValue() =>
        Some(n.byteValue())
      case _ => None
    }
    case DateType =>
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      value match {
        case v: java.lang.Integer => Some(v.intValue())
        case v: java.time.LocalDate => Some(DateTimeUtils.localDateToDays(v))
        case v: java.sql.Date => Some(DateTimeUtils.fromJavaDate(v))
        case _ => None
      }
    case TimestampType =>
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      value match {
        case v: java.lang.Long => Some(v.longValue())
        case v: java.time.Instant => Some(DateTimeUtils.instantToMicros(v))
        case v: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(v))
        case _ => None
      }
    case _ => None // float/double (NaN/-0.0 equality pitfalls) and complex types
  }

  /** True when manifest blooms support point lookups on `dt`. */
  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
        DateType | TimestampType => true
    case _ => false
  }
}

/** Per-group Bloom-filter builder (grouped by file in the commit-time
 *  harvest job): ordinary partial/final aggregate with OR-merge, so the
 *  column scan stays fully distributed. */
private[graft] case class BloomBuild(
    child: Expression,
    mBits: Int,
    k: Int = FileBloom.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (mBits < 64 || (mBits & (mBits - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(s"mBits=$mBits must be a power of two >= 64")
    else if (!FileBloom.supportedType(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build does not support ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val (h1, h2) = FileBloom.hashes(v, child.dataType)
      FileBloom.add(b, k, h1, h2)
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(FileBloom.encode(b, k))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuild =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): BloomBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuild =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "bloom_build"
}
