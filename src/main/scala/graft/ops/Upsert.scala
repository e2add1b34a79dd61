package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tables.SnapshotTable

/**
 * Hudi-semantics keyed upsert (reference `hudi/hudi_scd_script.py:34,36,
 * 115-119`; SURVEY.md §2.6, §7.3):
 *
 *  1. *Precombine*: incoming rows are deduplicated per record key, keeping
 *     the row with the greatest precombine value (`hoodie.datasource.write
 *     .precombine.field`, `hudi/hudi_scd_script.py:36`). Implemented as a
 *     `max_by` hash aggregation keyed on the record key — one shuffle,
 *     map-side combine-friendly, no driver involvement.
 *  2. *Index + write*: matched keys update in place, unmatched insert —
 *     exactly `MERGE … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *`,
 *     so it reuses [[MergeInto]]'s touched-file copy-on-write path (Hudi's
 *     record-key index lookup is the same left-semi shape, SURVEY.md §2.4).
 *
 * At scale the join shuffles hash-partitioned on the record key; the table
 * side is never broadcast (SURVEY.md §4.3). Incoming batches small enough
 * to broadcast are picked up automatically by AQE.
 */
object Upsert {

  def apply(
      table: SnapshotTable,
      incoming: DataFrame,
      keys: Seq[String],
      precombine: String,
      action: String = "merge"): SnapshotTable = {
    require(keys.nonEmpty, "upsert needs at least one record-key column")

    val deduped = precombineLatest(incoming, keys, precombine)

    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    table.merge(deduped, cond)
      // key collisions are impossible after precombine → skip the extra job
      .withoutCardinalityCheck()
      .withAction(action)
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
  }

  /** Keep only the max-precombine row per key: `max_by(struct(*), ts)`
   *  hash-aggregates with map-side partial combine — one shuffle, no
   *  per-partition sort (a `row_number` window would sort every
   *  partition; at 100 TB the partial-agg form moves only one row per
   *  key per map task). */
  def precombineLatest(incoming: DataFrame, keys: Seq[String], precombine: String): DataFrame = {
    val allCols = incoming.columns.toSeq
    // the ordering key is a never-null struct: (precombine IS NOT NULL,
    // precombine) — a bare max_by(_, ts) returns NULL when every ts in
    // the group is null, which would collapse the group into an all-NULL
    // row; with the struct, non-null precombine wins and an all-null
    // group still yields a real row
    incoming
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(allCols.map(col): _*),
        struct(col(precombine).isNotNull, col(precombine))).as("__pc_row"))
      .select(allCols.map(c => col(s"__pc_row.$c").as(c)): _*)
  }
}
