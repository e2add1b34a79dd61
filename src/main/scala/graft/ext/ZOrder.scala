package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton-curve) clustering: rows are sorted along an interleaved
 * multi-column key, so each output file covers a compact hyper-rectangle
 * of the key space — per-file min/max stats stay narrow on EVERY
 * clustered column, and a filter on any one of them prunes files
 * (range-clustering only achieves this for the leading column). The same
 * maintenance idea as Delta OPTIMIZE ZORDER BY / Iceberg sort orders.
 *
 * Columns are normalized to 16-bit buckets against their global min/max
 * (one lightweight agg job), then bit-interleaved into the sort key —
 * pure `Column` arithmetic, fully codegen'd, supports 2–4 numeric or
 * timestamp columns.
 */
object ZOrder {

  /** Bits per column: capped so the interleaved key never reaches bit 63
   *  — the long SIGN bit, which would make rows with a high top-column
   *  bucket sort NEGATIVE and split the curve (4 columns: 15 bits each). */
  private def bitsFor(n: Int): Int = math.min(16, 63 / n)

  /** Bit-interleaved Morton value of pre-bucketed columns (each in
   *  [0, 2^bits)). */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    (0 until bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        // bit j of bucket i lands at position j*n + i
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Repartition+sort `df` along the z-curve of `cols`. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4, "z-order needs 2..4 columns")
    val bits = bitsFor(cols.size)
    // global per-column bounds (driver-side scalars; one metadata-light agg)
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    // an empty frame (or an all-NULL column) has no bounds — clustering
    // is meaningless, and getDouble would NPE; return the frame as-is
    // (OPTIMIZE ZORDER on an empty table becomes a clean no-op commit)
    if ((0 until 2 * cols.size).exists(bounds.isNullAt)) return df
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val lo = bounds.getDouble(2 * i)
      val hi = bounds.getDouble(2 * i + 1)
      val span = math.max(hi - lo, 1e-12)
      least(greatest(
        (((col(c).cast("double") - lit(lo)) / lit(span)) * lit((1 << bits) - 1)).cast("long"),
        lit(0L)), lit((1L << bits) - 1))
    }
    df.withColumn("__z", interleave(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Delta `OPTIMIZE … ZORDER BY` analogue: rewrite the table's current
   *  snapshot z-clustered on `cols` in one atomic commit — point lookups
   *  on ANY clustered column prune files afterwards. Content unchanged.
   *  Commits through the pre-clustered overwrite path: the default
   *  overwrite would re-apply the table's persisted `clusterBy` spec via
   *  `repartitionByRange` and destroy the z-ordering just computed. */
  def optimize(
      table: graft.tables.SnapshotTable,
      cols: Seq[String],
      numFiles: Int): graft.tables.SnapshotTable = {
    // pin the snapshot the rewrite is derived from: a commit landing while
    // the clustering job runs either absorbs via the disjoint-file rebase
    // (a blind append — its files carry forward un-z-ordered, the
    // z-order-then-append serial schedule) or fails this optimize loudly
    // (anything touching the files/metadata the re-layout was derived
    // from) — never a silent overwrite. readVersion(v), NOT read(): the
    // expectVersion pin and the file list MUST come from the same
    // snapshot — read() re-resolves the head, so an append landing
    // between the two calls would have its rows inside the rewrite AND
    // its file carried forward by the rebase (duplicated rows)
    val v = table.currentVersion()
    table.overwritePreClustered(cluster(table.readVersion(v), cols, numFiles),
      "optimize-zorder", expectVersion = Some(v), rebaseDisjoint = true)
  }
}
