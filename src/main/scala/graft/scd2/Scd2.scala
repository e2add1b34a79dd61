package graft.scd2

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.SnapshotTable

/**
 * The reference's workload: Slowly Changing Dimension Type 2 incremental
 * ETL (`README.md:3`), re-expressed as library functions over
 * [[SnapshotTable]]. All three reference algorithms are provided:
 *
 *  - [[hudiStyleMerge]]   — DataFrame join + unionByName + keyed upsert
 *                           (`hudi/hudi_scd_script.py:72-119`)
 *  - [[icebergStyleMerge]] — LEAD()-windowed source + full-row MERGE
 *                           (`iceberg/iceberg_scd_script.py:54-82`)
 *  - [[deltaStyleMerge]]   — NULL-mergeKey double-row MERGE with partial
 *                           UPDATE (`delta/delta_scd_script.py:76-95`)
 *
 * Timestamp determinism: the reference relies on `current_timestamp()`
 * being constant-folded once per load (SURVEY.md §4.1); we make the load
 * timestamp an explicit parameter so results are reproducible, defaulting
 * to the session clock.
 */
object Scd2 {

  /** The source record, typed (the `Dataset[T]` API edge — internal
   *  pipelines stay `DataFrame`, per SURVEY.md §1.5). */
  final case class Contact(
      id: Option[Int], name: String, email: String, state: String)

  /** Source schema — declared, never inferred (`hudi/hudi_scd_script.py:24-28`). */
  val contactSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("state", StringType, nullable = true)))

  /** S1: headerless comma CSV with explicit schema (`hudi/hudi_scd_script.py:55-58`). */
  def readContactsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(contactSchema)
      .option("header", "false")
      .option("delimiter", ",")
      .csv(path)

  /** Typed variant of [[readContactsCsv]]: compile-time field access for
   *  callers that want it; the plan is identical (same scan, no extra
   *  serialization until a typed lambda is used). */
  def readContactsCsvTyped(spark: SparkSession, path: String): Dataset[Contact] = {
    import spark.implicits._
    readContactsCsv(spark, path).as[Contact]
  }

  /**
   * Stage enrichment (P3/X1-X6, `hudi/hudi_scd_script.py:59-63`): appends
   * `ts`, `valid_from`, `valid_to` (NULL via `'' CAST AS TIMESTAMP`),
   * `iscurrent`, `checksum = md5(concat(name,email,state))`.
   * `withTs=false` reproduces the Delta variant, which carries no
   * precombine column (`delta/delta_scd_script.py:33-36`).
   */
  def stage(df: DataFrame, loadTs: Timestamp, withTs: Boolean = true): DataFrame = {
    val base = if (withTs) df.withColumn("ts", lit(loadTs).cast(TimestampType)) else df
    base
      .withColumn("valid_from", lit(loadTs).cast(TimestampType))
      // The reference writes `lit('').cast(TimestampType)` and relies on
      // pre-ANSI Spark 3.3 yielding NULL; Spark 4 (ANSI) rejects that cast,
      // so we produce the intended NULL directly.
      .withColumn("valid_to", lit(null).cast(TimestampType))
      .withColumn("iscurrent", lit(1).cast(IntegerType))
      .withColumn("checksum", md5(concat(col("name"), col("email"), col("state"))))
  }

  /** Job 1 of every pipeline: stage + bulk-insert overwrite
   *  (`hudi/hudi_scd_script.py:51-70`). */
  def initialLoad(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      loadTs: Timestamp,
      withTs: Boolean = true): SnapshotTable =
    SnapshotTable.create(spark, root, stage(source, loadTs, withTs))

  /** Row counts the reference prints between stages
   *  (`hudi/hudi_scd_script.py:77,90,110,112`). */
  final case class MergeCounts(initial: Long, staged: Long, toExpire: Long, union: Long)

  /**
   * Hudi-script algorithm (`hudi/hudi_scd_script.py:72-119`):
   * join current table rows with staged rows on
   * `id equal && checksum differ && iscurrent = 1` (J1) to produce
   * expiry rows (old payload, `valid_to` = staged `valid_from`,
   * `iscurrent` = 0), unionByName with the staged batch (U2), then keyed
   * upsert on `(id, checksum)` with precombine `ts` (S5).
   */
  def hudiStyleMerge(
      table: SnapshotTable,
      incoming: DataFrame,
      loadTs: Timestamp,
      withCounts: Boolean = true): MergeCounts = {
    // The reference prints row counts between stages; each is a full
    // action, so production callers can skip them (counts report -1).
    def countOf(df: DataFrame): Long = if (withCounts) df.count() else -1L
    val initial = table.read().alias("initial")
    val initialCount = countOf(initial)

    // Incremental-load quirk: checksum added before iscurrent
    // (`hudi/hudi_scd_script.py:84-88`) — immaterial because the union
    // below is by name.
    val delta = stage(incoming, loadTs).alias("delta")
    val stagedCount = countOf(delta)

    val toExpire = initial
      .join(delta,
        col("initial.id") === col("delta.id") &&
          col("initial.checksum") =!= col("delta.checksum") &&
          col("initial.iscurrent") === 1,
        "inner")
      .select( // `hudi/hudi_scd_script.py:98-106`
        col("initial.id"), col("initial.name"), col("initial.email"),
        col("initial.state"), col("initial.ts"), col("initial.valid_from"),
        col("delta.valid_from").alias("valid_to"), col("initial.checksum"))
      .withColumn("iscurrent", lit(0).cast(IntegerType)) // `:107`

    val toExpireCount = countOf(toExpire)

    val unioned = delta.unionByName(toExpire, allowMissingColumns = true)
    val unionCount = countOf(unioned)

    table.upsert(unioned, keys = Seq("id", "checksum"), precombine = "ts")
    MergeCounts(initialCount, stagedCount, toExpireCount, unionCount)
  }

  /**
   * Iceberg-script algorithm (`iceberg/iceberg_scd_script.py:54-82`):
   * CTE1 = changed-and-current target rows UNION (distinct) all staged
   * rows; CTE2 = `LEAD(valid_from) OVER (PARTITION BY id ORDER BY
   * valid_from)`; final projection derives `valid_to`/`iscurrent`; MERGE
   * on `(id, checksum)` with full-row `UPDATE SET *` / `INSERT *`.
   * Preserves the quirk that unchanged staged rows match and get their
   * `ts`/`valid_from` refreshed (SURVEY.md §3.3).
   */
  def icebergStyleMerge(table: SnapshotTable, incoming: DataFrame, loadTs: Timestamp): SnapshotTable = {
    val staged = stage(incoming, loadTs)
    val cols = staged.columns.toSeq

    val tgt = table.read()
    val changedCurrent = tgt.alias("t")
      .join(staged.alias("s"),
        col("t.id") === col("s.id") &&
          col("t.checksum") =!= col("s.checksum") &&
          col("t.iscurrent") === 1,
        "inner")
      .select(cols.map(c => col(s"t.$c")): _*)

    // SQL UNION = union + distinct (U1, `iceberg/iceberg_scd_script.py:62`)
    val unioned = changedCurrent.union(staged.select(cols.map(col): _*)).distinct()

    val w = Window.partitionBy(col("id")).orderBy(col("valid_from"))
    val src = unioned
      .withColumn("eff_from", lead(col("valid_from"), 1).over(w))
      .withColumn("valid_to", col("eff_from"))
      .withColumn("iscurrent", when(col("eff_from").isNull, 1).otherwise(0).cast(IntegerType))
      .drop("eff_from")

    table.merge(src, col("t.id") === col("s.id") && col("t.checksum") === col("s.checksum"))
      .whenMatched().updateAll()   // `UPDATE SET *` (`:80`)
      .whenNotMatched().insertAll() // `INSERT *` (`:81`)
      .execute()
  }

  /**
   * Delta-script algorithm (`delta/delta_scd_script.py:76-95`): source =
   * `SELECT NULL AS mergeKey, s.*` for changed rows (never matches → the
   * new version always inserts) UNION `SELECT id AS mergeKey, *` for all
   * staged rows; MERGE on `target.id = source.mergeKey`;
   * `WHEN MATCHED AND checksum differs AND iscurrent = 1` partial UPDATE
   * (expire), `WHEN NOT MATCHED` INSERT. The Delta variant has no `ts`
   * column (`delta/delta_scd_script.py:33-36`).
   */
  def deltaStyleMerge(table: SnapshotTable, incoming: DataFrame, loadTs: Timestamp): SnapshotTable = {
    val staged = stage(incoming, loadTs, withTs = false)
    val cols = staged.columns.toSeq

    val tgt = table.read()
    val changedRows = tgt.alias("t")
      .join(staged.alias("s"),
        col("t.id") === col("s.id") &&
          col("t.checksum") =!= col("s.checksum") &&
          col("t.iscurrent") === 1,
        "inner")
      .select(lit(null).cast(IntegerType).as("mergeKey") +: cols.map(c => col(s"s.$c")): _*)

    val allStaged = staged.select(col("id").as("mergeKey") +: cols.map(col): _*)
    val src = changedRows.union(allStaged).distinct() // SQL UNION (`:83`)

    table.merge(src, col("t.id") === col("s.mergeKey"))
      .whenMatched(
        col("t.checksum") =!= col("s.checksum") && col("t.iscurrent") === 1)
      .update(Map( // `delta/delta_scd_script.py:93-94`
        "valid_to" -> col("s.valid_from"),
        "iscurrent" -> lit(0).cast(IntegerType)))
      .whenNotMatched().insertAll()
      .execute()
  }
}
