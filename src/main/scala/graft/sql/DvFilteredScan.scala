package graft.sql

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.types.StructType

/**
 * Deletion-vector overlay for a DSv2 parquet scan (Delta DV / Iceberg
 * positional-delete read parity for the catalog face): the underlying
 * scan is built with Spark's reserved row-index column appended to its
 * read schema — both parquet readers emit each row's physical position
 * in its file, the exact domain `_metadata.row_index` (and therefore the
 * DV sidecars) record — and this wrapper's readers drop the positions
 * the snapshot's sidecars name, then project the extra column away.
 *
 * Scale shape: the position map is O(deleted rows) driver/broadcast
 * state — the same budget [[graft.tables.SnapshotTable]]'s `dvRemove`
 * already spends on its broadcast anti-join, bounded per file by
 * `graft.dv.maxFraction` and reclaimed by REORG/purge. Filtering is
 * per-file binary search over a sorted long array, only on files that
 * actually carry deletions. Because a delete never moves a row between
 * files, this composes with [[KeyGroupedFileScan]]: a bucketed fact
 * table keeps reporting KeyGroupedPartitioning — and keeps its
 * shuffle-free storage-partitioned joins — while carrying DVs, where it
 * previously had to refuse and repay both shuffles per join.
 *
 * The trade: DV'd reads go row-based (`supportColumnarReads = false`)
 * so positions can be checked per row; clean snapshots keep the
 * untouched columnar fast path. Readers split each file-based partition
 * into its files and delegate the real reading to the underlying parquet
 * reader factory one file at a time, so pushdown and row-group skipping
 * still apply (the row index accounts for skipped groups).
 */
class DvFilteredScan(
    underlying: Scan,
    logical: StructType, // reported schema (row-index column stripped)
    full: StructType,    // underlying read schema (row-index appended last)
    dv: Broadcast[Map[String, Array[Long]]])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = logical
  override def toBatch: Batch = this
  override def description(): String =
    s"DvFiltered(${dv.value.size} files) " + underlying.description()
  // estimates delegate — they still count the deleted rows, which only
  // ever OVERstates size (join-size estimation stays safe-side)
  override def estimateStatistics(): Statistics = underlying match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }
  override def planInputPartitions(): Array[InputPartition] =
    underlying.toBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    new DvFilteredReaderFactory(
      underlying.toBatch.createReaderFactory(), dv, full, logical.length)
}

class DvFilteredReaderFactory(
    under: PartitionReaderFactory,
    dv: Broadcast[Map[String, Array[Long]]],
    full: StructType,
    outLen: Int)
    extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = false
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = org.apache.spark.sql.graftshim.SparkInternals
      .filePartitionFiles(p)
      .getOrElse(throw new IllegalStateException(
        s"DV-filtered scan expects file-based partitions, got ${p.getClass}"))
    new PartitionReader[InternalRow] {
      // prefix projection strips the appended row-index column; codegen'd
      private val proj = UnsafeProjection.create(
        (0 until outLen).map(i =>
          BoundReference(i, full(i).dataType, full(i).nullable)))
      private val idxOrdinal = outLen
      private var fi = -1
      private var cur: PartitionReader[InternalRow] = null
      private var deleted: Array[Long] = Array.emptyLongArray
      private var row: InternalRow = null
      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            fi += 1
            if (fi >= files.length) return false
            deleted = dv.value.getOrElse(files(fi)._1, Array.emptyLongArray)
            cur = under.createReader(files(fi)._2)
          } else if (cur.next()) {
            val r = cur.get()
            if (deleted.length == 0 ||
                java.util.Arrays.binarySearch(deleted, r.getLong(idxOrdinal)) < 0) {
              row = r
              return true
            }
          } else {
            cur.close(); cur = null
          }
        }
        false // unreachable
      }
      override def get(): InternalRow = proj(row)
      override def close(): Unit = if (cur != null) cur.close()
    }
  }
}
