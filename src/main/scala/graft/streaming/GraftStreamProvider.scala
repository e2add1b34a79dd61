package graft.streaming

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshim.SparkInternals
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SparkSession}

import graft.sql.GraftTable
import graft.tables.SnapshotTable

/**
 * Structured-Streaming SOURCE over a [[SnapshotTable]] — the engine-native
 * analogue of Delta's streaming source / Hudi's incremental streaming
 * query (`hoodie.datasource.query.type=incremental` run continuously):
 * every table commit becomes a micro-batch of the rows in files first
 * committed since the last processed version.
 *
 * {{{
 *   spark.readStream
 *     .format("graft-table")              // or the provider class name
 *     .option("path", tableRoot)
 *     .option("startingVersion", "3")        // optional; default: from v0
 *     .option("maxVersionsPerTrigger", "10") // optional backfill pacing
 *     .load()
 * }}}
 *
 * Offsets are table VERSIONS (checkpointed as JSON longs), so recovery
 * resumes exactly where the last committed batch ended — each file's rows
 * are delivered exactly once per checkpoint lineage. Granularity is the
 * same as [[SnapshotTable.readIncremental]]: file-level, so a
 * copy-on-write rewrite (merge/delete/update/compact) re-surfaces the
 * carried rows of rewritten files — a superset of the logically-changed
 * rows; consumers needing exact row deltas dedup downstream by key, the
 * documented Hudi-incremental trade. Pending MoR delta files surface as
 * they are committed.
 *
 * 100 TB notes: `getOffset` is one commit-log read (O(1) metadata);
 * `getBatch` plans a plain pruned parquet scan over only the new files —
 * the stream never rescans the table, and a quiet table costs nothing
 * per trigger.
 */
class GraftStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister with TableProvider {

  override def shortName(): String = "graft-table"

  // ------------------------------------------------- batch (TableProvider)
  // `spark.read.format("graft-table").load(root)` and
  // `df.write.format("graft-table").mode(…).save(root)` — the path-based
  // batch face (Delta's `format("delta")` analogue). Reads ride the same
  // DSv2 [[GraftTable]] as the catalog (pushed filters drive file-level
  // stats pruning); `versionAsOf` / `timestampAsOf` options pin a
  // time-travel snapshot.

  private def batchTable(params: CaseInsensitiveStringMap): GraftTable = {
    val path = Option(params.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-table requires a path: .load(<table root>) / .save(<table root>)"))
    val t = SnapshotTable(SparkSession.active, path)
    val pinned = Option(params.get("versionAsOf")).map(_.toLong)
      .orElse(Option(params.get("timestampAsOf")).map(s =>
        t.versionAsOf(parseTsMillis(s))))
    new GraftTable(t, Identifier.of(Array.empty, path), pinned)
  }

  /** Accept the timestamp shapes Delta's option does: a bare date, a
   *  zone-less date-time (space or 'T' separator), or a zoned ISO-8601
   *  instant. */
  private def parseTsMillis(s: String): Long = {
    val trimmed = s.trim
    if (trimmed.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.sql.Timestamp.valueOf(trimmed + " 00:00:00").getTime
    else
      try java.sql.Timestamp.valueOf(trimmed.replace('T', ' ')).getTime
      catch {
        case _: IllegalArgumentException =>
          try java.time.Instant.parse(trimmed).toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"timestampAsOf: cannot parse '$s' — use yyyy-MM-dd, " +
                  "yyyy-MM-dd HH:mm:ss[.f], or an ISO-8601 instant")
          }
      }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    batchTable(options).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    batchTable(new CaseInsensitiveStringMap(properties))

  /** Streaming SINK over a [[SnapshotTable]] — `writeStream
   *  .format("graft-table").option("path", root)` lands each micro-batch
   *  as one atomic snapshot commit with the same `stream-<batchId>`
   *  idempotent-redelivery guard as [[StreamIngest]]'s foreachBatch sinks.
   *  Options: `upsertKeys` (comma-separated) switches from append to
   *  keyed upsert with `precombine` (required then); `deferred=true`
   *  lands upserts as MoR delta files ([[SnapshotTable.upsertDeferred]]). */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink: use the table's persisted cluster spec instead of partitionBy")
    val keys = parameters.get("upsertKeys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val precombine = parameters.get("precombine")
    val deferred = parameters.get("deferred").exists(_.toBoolean)
    require(keys.isEmpty || precombine.nonEmpty,
      "graft-table sink: upsertKeys requires .option(\"precombine\", <col>)")
    require(!deferred || keys.nonEmpty,
      "graft-table sink: deferred=true requires upsertKeys (MoR is a keyed upsert)")
    // Complete/Update re-emit previously-delivered rows every trigger —
    // only the keyed upsert path absorbs that idempotently; blind append
    // would duplicate them (same restriction as Spark's file sinks)
    require(keys.nonEmpty || outputMode == OutputMode.Append(),
      s"graft-table sink: output mode $outputMode requires upsertKeys; " +
        "append-only ingestion supports Append mode only")
    new GraftTableSink(tableFor(sqlContext, parameters), keys, precombine, deferred)
  }

  private[streaming] def tableFor(
      sqlContext: SQLContext, params: Map[String, String]): SnapshotTable = {
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft-table requires .option(\"path\", <table root>)"))
    SnapshotTable(sqlContext.sparkSession, path)
  }

  /** `readChangeFeed=true` switches the source from row delivery to
   *  change delivery (Delta's streaming CDF option). */
  private def cdfEnabled(parameters: Map[String, String]): Boolean =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("readChangeFeed") => v.toBoolean
    }.getOrElse(false)

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    // a user-specified schema would bind batch columns positionally against
    // a shape the batches don't actually have — refuse like Delta does
    require(schema.isEmpty,
      "graft-table streaming source does not support a user-specified schema; " +
        "the table's committed schema is authoritative")
    val t = tableFor(sqlContext, parameters)
    (shortName(),
      if (cdfEnabled(parameters)) GraftTableSource.cdfSchema(t) else t.schema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableFor(sqlContext, parameters)
    // startingVersion = first version whose files are DELIVERED (inclusive);
    // the incremental cursor is exclusive, hence the -1
    val startCursor = parameters.get("startingVersion").map(_.toLong - 1).getOrElse(-1L)
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    require(maxPerTrigger.forall(_ > 0),
      s"graft-table source: maxVersionsPerTrigger must be positive, got ${maxPerTrigger.get}")
    // record key for the change-feed diff (falls back to the commit's
    // MoR keys or the `graft.cdf.keys` table property when omitted)
    val cdfKeys = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("cdfKeys") => v
    }.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new GraftTableSource(sqlContext.sparkSession, table, startCursor, maxPerTrigger,
      cdf = cdfEnabled(parameters), cdfKeys = cdfKeys)
  }
}

/** See [[GraftStreamProvider]]. `startCursor` is the exclusive version the
 *  first batch starts after (-1 = deliver everything); `maxPerTrigger`
 *  caps how many table versions one micro-batch may cover; `cdf = true`
 *  streams the CHANGE FEED ([[SnapshotTable.readChanges]] rows tagged
 *  `_change_type`/`_commit_version`/`_commit_ts`) instead of raw rows —
 *  Delta's `readChangeFeed` streaming option: the consumer sees exact
 *  keyed row-level deltas (deletes included) per commit, not the
 *  file-granularity superset of the default mode. */
class GraftTableSource(
    spark: SparkSession,
    table: SnapshotTable,
    startCursor: Long,
    maxPerTrigger: Option[Long] = None,
    cdf: Boolean = false,
    cdfKeys: Seq[String] = Nil) extends Source {

  override val schema: StructType =
    if (cdf) GraftTableSource.cdfSchema(table) else table.schema

  // ---- offset encoding -------------------------------------------------
  // Logical offsets are NOT raw table versions: data offsets are EVEN
  // (2·(version+1)) and an ODD offset (data offset + 1) is a one-shot
  // FLUSH marker. After the source has drained every committed version it
  // offers exactly one flush offset, whose batch is EMPTY — the no-data
  // micro-batch that lets a watermarked aggregation finalize windows the
  // last data batch's watermark advance unlocked (the AvailableNow /
  // Trigger.Once finalization real Delta/Hudi sources perform; without
  // it a run that ends on a data batch leaves closed windows unemitted
  // until the next run delivers more data). The marker is checkpointed
  // like any offset, so a RESTART with no new commits replays it as
  // already-delivered and terminates without inventing batches forever.
  private def encode(v: Long): Long = 2L * (v + 1)
  private def versionOf(o: Long): Long = o / 2 - 1 // odd o → its data version
  private def isFlush(o: Long): Boolean = (o & 1L) == 1L

  /** The newest LOGICAL offset this source has already handed to the
   *  engine — the base the per-trigger cap advances from. Initialized
   *  from the checkpoint on recovery: the engine replays `getBatch` for
   *  the last committed range before asking for new offsets (the
   *  V1-source state-restoration contract FileStreamSource also relies
   *  on). */
  @volatile private var delivered: Long = encode(startCursor)

  /** Latest committed version — capped at `delivered + maxPerTrigger`
   *  versions when rate-limited, so a cold start against a long table
   *  history backfills in bounded micro-batches instead of one giant scan
   *  (the scale story of Delta's maxFilesPerTrigger). None while the
   *  table is empty OR has not yet reached `startingVersion` —
   *  advertising an offset below the requested start would checkpoint it
   *  and silently deliver earlier-than-requested versions once the table
   *  catches up. Once drained, ONE flush offset (see encoding above).
   *  One commit-log listing, no data touched. */
  override def getOffset: Option[Offset] = {
    val v = table.currentVersion()
    if (v < 0 || v <= startCursor) return None
    val base = math.max(versionOf(delivered), startCursor)
    if (v > base) {
      val cap = maxPerTrigger.map(n => math.min(v, base + n)).getOrElse(v)
      Some(LongOffset(encode(cap)))
    } else if (!isFlush(delivered) && delivered > encode(startCursor)) {
      Some(LongOffset(delivered + 1)) // drained: one finalization batch
    } else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endLogical = toLogical(end)
    val from = start.map(o => versionOf(toLogical(o))).getOrElse(startCursor)
    val to = versionOf(endLogical)
    delivered = math.max(delivered, endLogical)
    val batch =
      if (cdf) table.readChanges(from, to, cdfKeys)
      else table.readIncremental(from, to)
    // The micro-batch engine binds this plan's attributes positionally
    // against the schema declared at stream start. A window whose files
    // carry a DIFFERENT schema (ADD COLUMNS / retyping overwrite landed
    // mid-stream or before a checkpoint replay) would misbind columns —
    // fail loudly instead, like Delta's schema-changed stream error.
    def shape(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name.toLowerCase, f.dataType.sql)) // ignores nullability
    if (shape(batch.schema) != shape(schema)) throw new IllegalStateException(
      s"table ${table.root} changed schema mid-stream (stream started with " +
        s"$schema, batch has ${batch.schema}); restart the query with a fresh " +
        "checkpoint to pick up the new schema")
    asStreaming(batch)
  }

  /** The micro-batch engine requires `isStreaming=true` on the plan a V1
   *  source returns (FileStreamSource marks its per-batch file relation
   *  the same way). The incremental read is a plain single-relation
   *  parquet scan, so flip the flag on its leaf. A CHANGE-FEED batch is
   *  a multi-relation diff plan (joins/unions) — marking its leaves
   *  would read as a stream-stream join, so wrap the whole plan as one
   *  streaming leaf instead ([[SparkInternals.asStreamingLeaf]]). */
  private def asStreaming(df: DataFrame): DataFrame = {
    if (cdf) return org.apache.spark.sql.graftshim.SparkInternals.asStreamingLeaf(df)
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case lr: LogicalRDD if !lr.isStreaming => // empty-increment batches
        lr.copy(isStreaming = true)(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], None, None)
    }
    org.apache.spark.sql.graftshim.SparkInternals.ofRows(spark, plan)
  }

  /** Offsets come back as [[LongOffset]] live, or as a checkpointed JSON
   *  string ([[org.apache.spark.sql.execution.streaming.runtime.SerializedOffset]])
   *  after recovery. Values are LOGICAL offsets (see encoding above). */
  private def toLogical(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[${table.root}]"
}

object GraftTableSource {
  /** Schema of the change-feed streaming mode: the table's committed
   *  schema plus [[SnapshotTable.readChanges]]'s three meta columns. */
  private[streaming] def cdfSchema(t: SnapshotTable): StructType =
    StructType(t.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_commit_ts",
        org.apache.spark.sql.types.TimestampType, nullable = true)))
}

/** See [[GraftStreamProvider.createSink]]: each micro-batch commits
 *  atomically with the `stream-<batchId>` action tag; a re-delivered
 *  batch after checkpoint recovery is recognized by that tag and skipped
 *  (the same exactly-once contract as [[StreamIngest]]). The incoming
 *  V1-sink frame is rebatched through [[SparkInternals.rebatch]] before
 *  entering the table's normal write paths. */
class GraftTableSink(
    table: SnapshotTable,
    keys: Seq[String],
    precombine: Option[String],
    deferred: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    if (StreamIngest.lastStreamBatch(table).contains(batchId)) return
    val batch = SparkInternals.rebatch(data.toDF())
    val action = s"stream-$batchId"
    // empty batches commit nothing (same guard as StreamIngest's
    // foreachBatch sinks): the source's finalization batch and no-data
    // triggers must not grow the table history with junk versions, a
    // merge over zero rows is wasted work, and a zero-row MoR delta
    // would pin the table's (keys, precombine) spec
    if (batch.isEmpty) ()
    else if (keys.isEmpty) table.appendAs(batch, action)
    else if (deferred) table.upsertDeferred(batch, keys, precombine.get, action)
    else table.upsertAs(batch, keys, precombine.get, action)
    ()
  }

  override def toString: String = s"GraftTableSink[${table.root}]"
}
