package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row}

import graft.tables.SnapshotTable

/**
 * Structured-Streaming ingestion into [[SnapshotTable]]s. The reference's
 * "incremental" loads are batch (SURVEY.md §1.1); this is the streaming
 * generalization a production lake needs: micro-batches land as atomic
 * snapshot commits, so readers always see a consistent table and a
 * crashed job resumes from its checkpoint without torn writes.
 *
 * Exactly-once: Spark re-delivers a micro-batch after recovery with the
 * same `batchId`; each commit records `stream-<batchId>` as its action,
 * and a re-delivered batch whose id is already the latest committed
 * stream id is skipped — append/upsert stay idempotent across retries.
 *
 * Scale: each micro-batch writes only its own files (append) or the
 * touched-file rewrite (upsert); commit metadata stays O(files).
 */
object StreamIngest {

  private val StreamAction = "stream-(\\d+)".r

  private[streaming] def lastStreamBatch(table: SnapshotTable): Option[Long] =
    table.findRecentAction(_.startsWith("stream-")) match {
      case Some(StreamAction(id)) => Some(id.toLong)
      case _ => None
    }

  /**
   * Streaming ingest with EXACT key dedup: at-least-once upstreams
   * (Kafka redelivery, retried producers) hand the stream duplicate
   * rows; `dropDuplicatesWithinWatermark` keeps each key's first
   * arrival with WATERMARK-BOUNDED state — the plain `dropDuplicates`
   * keeps every key ever seen, which is the unbounded-state trap at
   * corpus scale — and each surviving micro-batch lands as one atomic
   * idempotent commit ([[appendSink]]). A duplicate arriving after its
   * key aged out of the watermark window is indistinguishable from a
   * new row (the documented watermark trade); size `watermark` to the
   * upstream's redelivery horizon.
   */
  def dedupExactSink(
      stream: DataFrame,
      table: SnapshotTable,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String): DataStreamWriter[Row] = {
    require(keyCols.nonEmpty, "dedupExactSink needs at least one key column")
    appendSink(
      stream.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols),
      table)
  }

  /** Append every micro-batch as one atomic snapshot commit. */
  def appendSink(stream: DataFrame, table: SnapshotTable): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!lastStreamBatch(table).contains(batchId)) {
        table.appendAs(batch, s"stream-$batchId")
      }
      ()
    }

  /** Keyed upsert per micro-batch — streaming SCD0/1 ingestion
   *  (Hudi's streaming upsert shape, `hudi/hudi_scd_script.py:115-119`). */
  def upsertSink(
      stream: DataFrame,
      table: SnapshotTable,
      keys: Seq[String],
      precombine: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!lastStreamBatch(table).contains(batchId) && !batch.isEmpty) {
        table.upsertAs(batch, keys, precombine, s"stream-$batchId")
      }
      ()
    }

  /** Merge-on-read streaming upsert: each micro-batch lands as DELTA
   *  files in O(batch) work — no base rewrite per batch, the whole point
   *  of MoR under frequent small upserts ([[SnapshotTable.upsertDeferred]];
   *  Hudi's streaming-into-`_rt` shape). Run
   *  [[SnapshotTable.applyDeltas]] periodically to fold the log in. */
  def deferredUpsertSink(
      stream: DataFrame,
      table: SnapshotTable,
      keys: Seq[String],
      precombine: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!lastStreamBatch(table).contains(batchId) && !batch.isEmpty) {
        table.upsertDeferred(batch, keys, precombine, s"stream-$batchId")
      }
      ()
    }

  /**
   * Streaming ingest with incremental near-dup dedup: each micro-batch
   * is filtered against a PERSISTENT MinHash signature index
   * ([[graft.ext.Dedup.dedupIncremental]]) before landing — the
   * steady-state "only ingest novel documents" loop. Survivors append
   * to `table`; their signatures ([[graft.ext.Dedup.minhashSignatures]]
   * at the library defaults — the index's parameters, fixed for its
   * lifetime) append to `sigTable`, so the NEXT batch (and the next
   * run) dedups against everything ingested so far.
   *
   * Crash safety: the two appends share the stream-batch tag and are
   * individually idempotent. A crash between them re-delivers the
   * batch, which recomputes the SAME survivor set — the index cannot
   * yet contain this batch's signatures, and within-batch grouping is
   * deterministic — so the guard fills in only the missing side.
   *
   * 100 TB shape: the index is streamed through one band join per
   * batch (never self-joined), so per-batch cost stays O(index bands +
   * batch collisions) no matter how many batches have accumulated.
   */
  def dedupIngestSink(
      stream: DataFrame,
      table: SnapshotTable,
      sigTable: SnapshotTable,
      idCol: String,
      textCol: String,
      minEst: Double = 0.5): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val tag = s"stream-$batchId"
        // first batch ever: the index table has no commits yet — an
        // empty index with the right schema, derived from the batch
        val indexV = sigTable.currentVersion()
        // geometry-pinned serve: this sink signs at the library defaults;
        // a sigTable a foreign writer built (and pinned) at different
        // minhash geometry would band-hash different slices and let every
        // duplicate through silently — refuse it instead
        if (indexV >= 0) graft.ext.Dedup.checkSignatureGeometry(sigTable)
        val index =
          if (indexV < 0)
            graft.ext.Dedup.minhashSignatures(batch.limit(0), idCol, textCol)
          else sigTable.readVersion(indexV) // pin exactly what we dedup against
        val survivors = graft.ext.Dedup
          .dedupIncremental(index, batch, idCol, textCol, minEst)
          .localCheckpoint() // two consumers: data append + signature build
        try {
          if (!survivors.isEmpty) {
            if (!lastStreamBatch(table).contains(batchId))
              table.appendAs(survivors, tag)
            // the signature append is NOT blind — survivors were computed
            // against index version `indexV`, so a foreign writer landing
            // sigs in between must fail this batch (expectVersion guard;
            // no silent rebase). Spark then re-runs the batch: the doc
            // append idempotent-skips via its stream tag, and the sig
            // append recomputes against the fresh index. The few extra
            // docs the first attempt admitted are near-dups of content
            // whose signatures the FOREIGN writer indexed, so future
            // duplicates of them are still caught by those entries.
            if (!lastStreamBatch(sigTable).contains(batchId))
              sigTable.appendAs(
                graft.ext.Dedup.minhashSignatures(survivors, idCol, textCol), tag,
                expectVersion = Some(indexV),
                // pin the geometry this index is being built at, so a
                // later serve (or session) validates against it
                extraProps = graft.ext.Dedup.signatureGeometryProps())
          }
        } finally graft.ext.Dedup.release(survivors)
      }
      ()
    }

  /**
   * [[dedupIngestSink]] over a PERSISTED, file-pruned minhash index
   * ([[graft.ext.Dedup.buildMinhashIndexTables]]) — the production
   * steady state of streaming corpus ingest at index sizes where the
   * flat sink's per-batch full index scan stops being payable: each
   * micro-batch key-probes the banded/signature tables
   * ([[graft.ext.Dedup.minhashPairsIncrementalIndexed]] — per-batch cost
   * rides the batch's matches, not the index size), survivors land in
   * `table`, and their band + signature rows extend the index
   * ([[graft.ext.Dedup.minhashIndexAppend]] under the tables' pinned
   * geometry) so the NEXT batch dedups against everything ingested so
   * far. Run [[graft.ext.Dedup.compactMinhashIndex]] periodically —
   * recluster commits interleave transparently (the redelivery guard
   * scans through maintenance commits; appends rebase on top).
   *
   * Recovery contract mirrors [[dedupIngestSink]], per table: the doc
   * and index appends each idempotent-skip on the `stream-<batchId>`
   * tag, and the index appends are `expectVersion`-guarded against the
   * snapshots the survivors were computed from, so a foreign index
   * writer fails the batch and Spark's re-run recomputes against the
   * fresh index.
   */
  def indexedDedupIngestSink(
      stream: DataFrame,
      table: SnapshotTable,
      bandTable: SnapshotTable,
      sigTable: SnapshotTable,
      idCol: String,
      textCol: String,
      minEst: Double = 0.5): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val tag = s"stream-$batchId"
        val g = graft.ext.Dedup.indexGeometryOf(sigTable)
        // pin the index snapshots the survivor set is computed against
        val bandV = bandTable.currentVersion()
        val sigV = sigTable.currentVersion()
        val pairs = graft.ext.Dedup.minhashPairsIncrementalIndexed(
          bandTable, sigTable, batch, idCol, textCol,
          g.shingleSize, g.numHashes, g.bands, minEst, g.seed)
        val survivors = graft.ext.Dedup
          .dedupIncrementalFromPairs(pairs, batch, idCol)
          .localCheckpoint() // three consumers: doc append + two index rows
        try {
          if (!survivors.isEmpty) {
            if (!lastStreamBatch(table).contains(batchId))
              table.appendAs(survivors, tag)
            val skipBand = lastStreamBatch(bandTable).contains(batchId)
            val skipSig = lastStreamBatch(sigTable).contains(batchId)
            if (!skipBand || !skipSig)
              graft.ext.Dedup.minhashIndexAppend(bandTable, sigTable,
                survivors, idCol, textCol, action = tag,
                expectBandVersion = Some(bandV), expectSigVersion = Some(sigV),
                skipBand = skipBand, skipSig = skipSig)
          }
        } finally {
          graft.ext.Dedup.release(survivors)
          graft.ext.Dedup.release(pairs)
        }
      }
      ()
    }

  /**
   * Streaming ingest with EXACT duplicated-span dedup — q75's
   * incremental substring dedup chained in-line: each micro-batch
   * cleans against the persisted [[graft.ext.TextAnalysis.spanGramIndex]]
   * table (spans already in the corpus lose every batch occurrence;
   * within-batch dups keep their batch-canonical copy), fully-erased
   * documents (exact duplicates) are dropped, survivors land in `table`
   * with `textCol` replaced by the cleaned text (plus `n_removed`
   * provenance), and the index extends by the batch's fresh grams only
   * (8 bytes each; grams of removed spans are already indexed).
   *
   * Recovery contract mirrors [[dedupIngestSink]]: the doc append
   * idempotent-skips on its `stream-<batchId>` tag; the gram append is
   * `expectVersion`-guarded so a foreign index writer fails the batch
   * and Spark's re-run recomputes against the fresh index.
   */
  def spanDedupIngestSink(
      stream: DataFrame,
      table: SnapshotTable,
      gramTable: SnapshotTable,
      idCol: String,
      textCol: String,
      n: Int = 10): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val tag = s"stream-$batchId"
        val indexV = gramTable.currentVersion()
        // geometry-pinned serve (the minhash-index discipline): a gram
        // table built at a different n hashes different windows, the
        // equi-join finds nothing, and corpus spans silently survive
        if (indexV >= 0) graft.ext.TextAnalysis.checkSpanGramGeometry(gramTable, n)
        val index =
          if (indexV < 0) // first batch: typed empty index derived from the batch
            graft.ext.TextAnalysis.spanGramIndex(batch.limit(0), idCol, textCol, n)
          else gramTable.readVersion(indexV) // pin exactly what we dedup against
        val cleaned = graft.ext.TextAnalysis
          .removeDuplicatedSpansIncremental(batch, index, idCol, textCol, n)
          .filter(col("clean_text") =!= "") // exact dups erase fully: drop
          .select(col(idCol), col("clean_text").as(textCol), col("n_removed"))
        if (!lastStreamBatch(table).contains(batchId))
          table.appendAs(cleaned, tag)
        if (!lastStreamBatch(gramTable).contains(batchId)) {
          val fresh = graft.ext.TextAnalysis
            .spanGramIndex(batch, idCol, textCol, n)
            .join(index, Seq("g"), "left_anti")
          gramTable.appendAs(fresh, tag, expectVersion = Some(indexV),
            // pin the gram size this index is being built at
            extraProps = Map(graft.ext.TextAnalysis.SpanGramNProp -> n.toString))
        }
      }
      ()
    }

  /**
   * Streaming ANN ingest — the stored-index closure of what
   * [[dedupIngestSink]] does for near-dup dedup: each micro-batch of
   * (id, vector) rows is ASSIGNED under the persisted index's pinned
   * quantizer ([[graft.ext.Similarity.ivfAppendTo]] — map-side
   * nearest-centroid, range-sorted on `list` so appended files keep
   * tight stats and per-file blooms) and lands in the assigned table as
   * ONE atomic `stream-<batchId>` commit. A re-delivered micro-batch
   * whose id is already the latest committed stream id skips —
   * exactly-once across recovery. The quantizer fingerprint is
   * validated per batch (`checkIvfGeometry` inside the append), so a
   * drifted or swapped centroid table refuses the batch loudly instead
   * of silently assigning to wrong lists. Probes against the table
   * ([[graft.ext.Similarity.ivfProbeIndexed]]) see every streamed batch
   * the moment its commit lands.
   *
   * 100 TB shape: per-batch work is the batch's own assignment — one
   * broadcast of ≤nlist centroids, no shuffle of the index — so ingest
   * cost rides the batch, not the index size.
   */
  def ivfIngestSink(
      stream: DataFrame,
      tables: graft.ext.Similarity.IvfIndexTables,
      idCol: String,
      vecCol: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty && !lastStreamBatch(tables.assigned).contains(batchId)) {
        graft.ext.Similarity.ivfAppendTo(tables, batch, idCol, vecCol,
          action = s"stream-$batchId")
      }
      ()
    }

  /**
   * Watermarked tumbling-window aggregation → snapshot table: the
   * standard streaming-rollup pipeline (event time, late-data bound,
   * append-mode emission of finalized windows).
   */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      window: String = "1 minute",
      watermark: String = "2 minutes",
      valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("w"),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col(keyCol), col("n"), col("sum_value"))

  /**
   * Streaming ingest dedup: drop re-deliveries of the same `idCols` row
   * arriving within the event-time watermark — the at-least-once-source
   * guard a training-data ingest runs before rows ever land in a table
   * (upstream replays, producer retries). State is per-id and EXPIRES
   * once the watermark passes `delay`, so it stays bounded at any
   * throughput — unlike a bare `dropDuplicates`, whose state grows
   * forever and OOMs a long-running query.
   */
  def dedupeWithinWatermark(
      stream: DataFrame,
      tsCol: String,
      idCols: Seq[String],
      delay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** One closed user session (emitted once the gap timeout passes). */
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  private[streaming] final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /**
   * Event-time sessionization with custom state
   * (`flatMapGroupsWithState`): events for a user belong to one session
   * until a gap of `gapMs` passes; a session is emitted when the event-
   * time watermark moves past its close. State is per-key and bounded
   * (one running session per user); timeouts are event-time based, so
   * recovery replays deterministically from the checkpoint.
   */
  def sessionize(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes",
      valueCol: String = "value"): org.apache.spark.sql.Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(userCol).cast("long").as("__u"),
        col(tsCol).cast("timestamp").as("__ts"),
        // a NULL metric contributes 0 to the session sum; a NULL or
        // non-numeric user id / NULL timestamp cannot be sessionized
        // and would crash the non-nullable tuple encoder — drop those
        coalesce(col(valueCol).cast("double"), lit(0.0)).as("__v"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull)
      .withWatermark("__ts", watermark) // after the cast, or the tag is lost
      .as[(Long, Timestamp, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + v))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Run a stream-to-table sink until no more data is available
   *  (test/backfill helper; production callers pick their own trigger). */
  def runOnce(writer: DataStreamWriter[Row], checkpoint: String): StreamingQuery = {
    val q = writer
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
