package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.SnapshotTable

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming append: micro-batches land as atomic snapshot commits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val table = SnapshotTable(spark, tmpDir("stream"))
    val ckpt = tmpDir("ckpt") // ONE checkpoint — restarts resume from it
    mem.addData((1, "a"), (2, "b"))
    StreamIngest.runOnce(
      StreamIngest.appendSink(mem.toDF().toDF("id", "v"), table), ckpt)
    assert(table.read().count() === 2)
    assert(table.manifestAction().exists(_.startsWith("stream-")))

    mem.addData((3, "c"))
    StreamIngest.runOnce(
      StreamIngest.appendSink(mem.toDF().toDF("id", "v"), table), ckpt)
    // resumed query processes ONLY the new offsets: no duplicates of 1/2
    assert(table.read().select("id").as[Int].collect().toSet === Set(1, 2, 3))
    assert(table.read().count() === 3)
  }

  test("streaming upsert: keyed micro-batch merge with precombine") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String, Long)]
    val table = SnapshotTable.create(spark, tmpDir("stream"),
      Seq((1, "old", 0L)).toDF("id", "v", "ts"))
    mem.addData((1, "new", 5L), (1, "stale", 3L), (2, "ins", 1L))
    StreamIngest.runOnce(
      StreamIngest.upsertSink(mem.toDF().toDF("id", "v", "ts"), table,
        keys = Seq("id"), precombine = "ts"),
      tmpDir("ckpt"))
    assert(table.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "new", 5L), (2, "ins", 1L)))
  }

  test("dedup ingest sink: batches land deduped against the growing index") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val table = SnapshotTable(spark, tmpDir("dedup_data"))
    val sigTable = SnapshotTable(spark, tmpDir("dedup_sigs"))
    val ckpt = tmpDir("ckpt")
    def sink = StreamIngest.dedupIngestSink(
      mem.toDF().toDF("doc_id", "text"), table, sigTable, "doc_id", "text")
    // batch 0: within-batch dup (1≡2) → min id wins; 3 is novel
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog near the barn"),
      (2L, "the quick brown fox jumps over the lazy dog near the barn"),
      (3L, "completely different text about spark catalyst optimizer rules"))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    assert(sigTable.read().count() === 2) // survivors' signatures only
    // batch 1: 11 re-sends batch-0 content (dropped against the INDEX,
    // not this batch); 12 is novel and survives
    mem.addData(
      (11L, "the quick brown fox jumps over the lazy dog near the barn"),
      (12L, "yet another entirely unrelated document body goes right here"))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 12L))
    assert(sigTable.read().count() === 3)
    // crash-between-appends recovery: simulate the data append having
    // landed for batch 2 while the signature append was lost — the
    // re-delivered batch must fill in ONLY the signature side
    val extra = Seq((21L, "fresh content for the recovery scenario of this test"))
      .toDF("doc_id", "text")
    table.appendAs(extra, "stream-2")
    mem.addData((21L, "fresh content for the recovery scenario of this test"))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().filter(col("doc_id") === 21L).count() === 1, "data duplicated")
    assert(sigTable.read().filter(col("doc") === 21L).count() === 1, "sigs missing")
    // the sink pinned the library-default minhash geometry on the index
    // it built; a foreign-geometry table is refused at serve time
    assert(sigTable.properties().get("graft.minhash.numHashes") === Some("64"))
    val eg = intercept[IllegalArgumentException] {
      graft.ext.Dedup.checkSignatureGeometry(sigTable, numHashes = 32)
    }
    assert(eg.getMessage.contains("numHashes"), eg.getMessage)
  }

  test("indexed dedup ingest sink: probes the stored index, grows it, survives compaction") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val table = SnapshotTable(spark, tmpDir("idx_dedup_data"))
    val corpus = graft.tools.ScaleCorpus.documents(spark, 50)
      .select(col("doc_id"), col("text"))
    val tmp = tmpDir("idx_dedup_idx")
    val (bandT, sigT) = graft.ext.Dedup.buildMinhashIndexTables(spark,
      s"$tmp/bands", s"$tmp/sigs", corpus, "doc_id", "text", filesPerTable = 4)
    val ckpt = tmpDir("ckpt")
    def sink = StreamIngest.indexedDedupIngestSink(
      mem.toDF().toDF("doc_id", "text"), table, bandT, sigT, "doc_id", "text")
    // batch 0: 1010 copies corpus doc 10 (dropped via the key-probed
    // index), 2001 is novel and survives
    val freshA = "zqa1 zqb1 zqc1 zqd1 zqe1 zqf1 zqg1"
    mem.addData((1010L, corpus.filter(col("doc_id") === 10L)
      .select("text").as[String].head()), (2001L, freshA))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().select("doc_id").as[Long].collect().toSet === Set(2001L))
    assert(sigT.read().filter(col("doc") === 2001L).count() === 1,
      "survivor's signature missing from the index")
    // batch 1: 3001 re-sends batch-0's novel content — dropped against
    // the GROWN index, proving the appended rows serve; 3002 is novel
    mem.addData((3001L, freshA),
      (3002L, "zqa2 zqb2 zqc2 zqd2 zqe2 zqf2 zqg2"))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().select("doc_id").as[Long].collect().toSet
      === Set(2001L, 3002L))
    // maintenance interleaves: recluster both index tables, then the
    // redelivery guard and the serve must both see through the commits
    graft.ext.Dedup.compactMinhashIndex(bandT, sigT, filesPerTable = 4)
    mem.addData((4001L, "zqa2 zqb2 zqc2 zqd2 zqe2 zqf2 zqg2"))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().select("doc_id").as[Long].collect().toSet
      === Set(2001L, 3002L), "compacted index lost a stored signature")
    // crash-between-appends recovery: the data append landed for batch 3
    // but both index appends were lost — the re-delivered batch fills in
    // only the index side
    val freshB = "zqa3 zqb3 zqc3 zqd3 zqe3 zqf3 zqg3"
    table.appendAs(Seq((5001L, freshB)).toDF("doc_id", "text"), "stream-3")
    mem.addData((5001L, freshB))
    StreamIngest.runOnce(sink, ckpt)
    assert(table.read().filter(col("doc_id") === 5001L).count() === 1,
      "data duplicated on redelivery")
    assert(sigT.read().filter(col("doc") === 5001L).count() === 1 &&
      bandT.read().filter(col("doc") === 5001L).count() > 0,
      "index side not filled in on redelivery")
  }

  test("span-dedup ingest sink: spans cut against the growing gram index") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val table = SnapshotTable(spark, tmpDir("span_data"))
    val gramTable = SnapshotTable(spark, tmpDir("span_grams"))
    val ckpt = tmpDir("ckpt")
    def sink = StreamIngest.spanDedupIngestSink(
      mem.toDF().toDF("doc_id", "text"), table, gramTable, "doc_id", "text", n = 4)
    // batch 0: 2 duplicates 1 exactly (→ fully erased, dropped); 3 novel
    mem.addData(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "p q r s t u"))
    StreamIngest.runOnce(sink, ckpt)
    val b0 = table.read().as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(b0.keySet === Set(1L, 3L), s"exact dup must be dropped: $b0")
    assert(b0(1L) === ((1L, "a b c d e f", 0L)))
    val gramsAfter0 = gramTable.read().count()
    assert(gramsAfter0 > 0)
    // batch 1: 11 embeds batch-0's span inside fresh prose → span cut,
    // unique tokens survive; 12 is entirely novel
    mem.addData(
      (11L, "x y a b c d q r"),
      (12L, "m n o k l w"))
    StreamIngest.runOnce(sink, ckpt)
    val b1 = table.read().as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(b1(11L) === ((11L, "x y q r", 4L)), s"indexed span must be cut: $b1")
    assert(b1(12L) === ((12L, "m n o k l w", 0L)))
    // the index grew by batch-1's fresh grams only (no duplicates)
    val grams = gramTable.read().as[Long].collect()
    assert(grams.distinct.length === grams.length, "gram index must stay distinct")
    assert(grams.length > gramsAfter0)
    // the sink pinned its gram size on the index it built…
    assert(gramTable.properties().get(graft.ext.TextAnalysis.SpanGramNProp)
      === Some("4"))
    // …so a sink serving the same index at a DIFFERENT n (which would
    // hash different windows and silently let every corpus span through)
    // fails the batch loudly instead
    mem.addData((21L, "z z1 z2 z3 z4 z5"))
    val e = intercept[Exception] {
      StreamIngest.runOnce(StreamIngest.spanDedupIngestSink(
        mem.toDF().toDF("doc_id", "text"), table, gramTable,
        "doc_id", "text", n = 3), tmpDir("ckpt2"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("was built with n=4")), msgs(e).mkString(" | "))
  }

  test("ivf ingest sink: streamed batches join the pinned index, probe exact, re-delivery skips") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Similarity
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    def v(i: Int): Array[Float] = {
      val c = base(i % 3)
      c.zipWithIndex.map { case (x, j) => x + (if (j == 3) 0.005f * i else 0f) }
    }
    val all = (0 until 48).map(i => (i.toLong, v(i)))
    val vecs = all.toDF("vec_id", "vec")
    // index built on the first half; the second half arrives as a stream
    val tables = Similarity.buildIvfIndexTables(spark,
      tmpDir("ivfs_cent"), tmpDir("ivfs_asg"),
      vecs.filter(col("vec_id") < 24), "vec_id", "vec",
      nlist = 4, sampleN = 100, filesPerTable = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val ckpt = tmpDir("ckpt") // ONE checkpoint — restarts resume from it
    def sink = StreamIngest.ivfIngestSink(
      mem.toDF().toDF("vec_id", "vec"), tables, "vec_id", "vec")
    mem.addData(all.slice(24, 36): _*)
    StreamIngest.runOnce(sink, ckpt)
    assert(tables.assigned.read().count() === 36)
    assert(tables.assigned.history().count(_.action.startsWith("stream-")) === 1)
    mem.addData(all.slice(36, 48): _*)
    StreamIngest.runOnce(sink, ckpt)
    assert(tables.assigned.read().count() === 48)
    assert(tables.assigned.history().count(_.action.startsWith("stream-")) === 2)
    // exhaustive probe (nProbe = nlist) over build+stream = brute force
    // over the whole corpus — a lost or doubled batch would show here
    val probes = vecs.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id"), col("n_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(rows(Similarity.ivfProbeIndexed(tables, probes, "vec_id", "vec",
        k = 3, nProbe = 4))
      === rows(Similarity.bruteForceTopK(vecs, probes, "vec_id", "vec", k = 3)))
    // re-delivery of the LATEST batch id (crash after commit, before the
    // checkpoint advanced): the sink's guard sees the id and skips
    val vBefore = tables.assigned.currentVersion()
    val lastId = StreamIngest.lastStreamBatch(tables.assigned).get
    if (!StreamIngest.lastStreamBatch(tables.assigned).contains(lastId))
      Similarity.ivfAppendTo(tables, all.slice(36, 48).toDF("vec_id", "vec"),
        "vec_id", "vec", action = s"stream-$lastId")
    assert(tables.assigned.currentVersion() === vBefore)
    assert(tables.assigned.read().count() === 48)
  }

  test("re-delivered batch id is skipped (idempotent recovery)") {
    val table = SnapshotTable(spark, tmpDir("stream"))
    val batch = Seq((1, "a")).toDF("id", "v")
    // simulate foreachBatch redelivery of batch 0
    table.appendAs(batch, "stream-0")
    val vBefore = table.currentVersion()
    // the sink's guard: same batch id as latest commit → skip
    if (!table.manifestAction().contains("stream-0")) table.appendAs(batch, "stream-0")
    assert(table.currentVersion() === vBefore)
    assert(table.read().count() === 1)
  }

  test("re-delivered UPSERT batch id is skipped: commits carry the stream tag") {
    val table = SnapshotTable.create(spark, tmpDir("stream"),
      Seq((1, "old", 0L)).toDF("id", "v", "ts"))
    val batch = Seq((1, "new", 5L)).toDF("id", "v", "ts")
    // the sink's commit path must tag the commit with the batch id —
    // an upsert that tagged "merge" would redo the rewrite on redelivery
    table.upsertAs(batch, Seq("id"), "ts", "stream-7")
    assert(table.manifestAction().contains("stream-7"))
    val vBefore = table.currentVersion()
    // redelivery: guard sees the id, no new commit, no spurious rewrite
    if (!table.manifestAction().contains("stream-7"))
      table.upsertAs(batch, Seq("id"), "ts", "stream-7")
    assert(table.currentVersion() === vBefore)
    assert(table.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "new", 5L)))
  }

  test("streaming MoR sink: micro-batches land as deltas, no base rewrite") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String, Long)]
    val table = SnapshotTable.create(spark, tmpDir("stream"),
      Seq((1, "old", 0L)).toDF("id", "v", "ts"))
    val baseFiles = table.manifest()
    mem.addData((1, "new", 5L), (2, "ins", 1L))
    StreamIngest.runOnce(
      StreamIngest.deferredUpsertSink(mem.toDF().toDF("id", "v", "ts"), table,
        keys = Seq("id"), precombine = "ts"),
      tmpDir("ckpt"))
    // base untouched; merged view serves the upserts; batch id recorded
    assert(table.manifest() === baseFiles)
    assert(table.deltaManifest().nonEmpty)
    assert(table.manifestAction().exists(_.startsWith("stream-")))
    assert(table.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "new", 5L), (2, "ins", 1L)))
    // fold in and verify content survives compaction
    assert(table.applyDeltas() >= 1)
    assert(table.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "new", 5L), (2, "ins", 1L)))
  }

  test("writeStream.format(graft-table) appends micro-batches with resume") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val root = tmpDir("fmtsink")
    val ckpt = tmpDir("ckpt")
    def run(): Unit = StreamIngest.runOnce(
      mem.toDF().toDF("id", "v").writeStream
        .format("graft-table").option("path", root), ckpt)
    mem.addData((1, "a"), (2, "b"))
    run()
    val table = SnapshotTable(spark, root)
    assert(table.read().count() === 2)
    assert(table.manifestAction().exists(_.startsWith("stream-")))
    mem.addData((3, "c"))
    run() // resumed from the same checkpoint: no duplicates of 1/2
    assert(table.read().select("id").as[Int].collect().toSet === Set(1, 2, 3))
  }

  test("writeStream.format(graft-table) with upsertKeys does keyed upserts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String, Long)]
    val table = SnapshotTable.create(spark, tmpDir("fmtup"),
      Seq((1, "old", 0L)).toDF("id", "v", "ts"))
    mem.addData((1, "new", 5L), (1, "stale", 3L), (2, "ins", 1L))
    StreamIngest.runOnce(
      mem.toDF().toDF("id", "v", "ts").writeStream
        .format("graft-table").option("path", table.root)
        .option("upsertKeys", "id").option("precombine", "ts"),
      tmpDir("ckpt"))
    assert(table.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "new", 5L), (2, "ins", 1L)))
    // upsertKeys without precombine is refused at sink creation
    val bad = intercept[Exception](
      mem.toDF().toDF("id", "v", "ts").writeStream
        .format("graft-table").option("path", table.root)
        .option("upsertKeys", "id")
        .option("checkpointLocation", tmpDir("ckpt")).start())
    assert(bad.getMessage.contains("precombine"))
  }

  test("streaming read source: commits arrive as micro-batches, resume is exact") {
    val root = tmpDir("streamsrc")
    val t = SnapshotTable.create(spark, root, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val sink = SnapshotTable(spark, tmpDir("streamsrc_sink"))
    val ckpt = tmpDir("ckpt") // ONE checkpoint — each run resumes it
    def run(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        spark.readStream.format("graft-table").option("path", root).load(), sink),
      ckpt)
    run()
    assert(sink.read().as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
    // two more commits while the stream is down
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.append(Seq((4, "d")).toDF("id", "v"))
    run()
    // the resumed stream delivers ONLY the files committed after its
    // checkpointed version: no re-delivery of the initial snapshot, so
    // the accumulating sink has exactly one copy of every row
    assert(sink.read().as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    assert(sink.read().count() === 4)
    // caught-up stream delivers nothing
    run()
    assert(sink.read().count() === 4)
  }

  test("streaming read source: startingVersion skips the backfill") {
    val root = tmpDir("streamsrc2")
    val t = SnapshotTable.create(spark, root,
      Seq((1, "a", 0L)).toDF("id", "v", "ts"))          // v0
    t.append(Seq((2, "b", 0L)).toDF("id", "v", "ts"))   // v1
    t.upsertDeferred(Seq((2, "b2", 1L)).toDF("id", "v", "ts"),
      keys = Seq("id"), precombine = "ts")              // v2 (MoR delta)
    val stream = spark.readStream.format("graft-table")
      .option("path", root).option("startingVersion", "1").load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("graft_src_sv")
      .option("checkpointLocation", tmpDir("ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // v0's initial file skipped; v1's append and v2's MoR delta delivered
    assert(spark.table("graft_src_sv").select("id", "v")
      .as[(Int, String)].collect().toSet === Set((2, "b"), (2, "b2")))
  }

  test("streaming change feed delivers tagged row-level deltas incl. deletes") {
    val root = tmpDir("streamcdf")
    val t = SnapshotTable.create(spark, root,
      Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("id", "v", "ts")) // v0
    t.update(col("id") === 2, Map("v" -> lit("b2")))                          // v1
    t.deleteDeferred(col("id") === 3, Seq("id"), "ts")                        // v2
    val stream = spark.readStream.format("graft-table")
      .option("path", root).option("startingVersion", "1")
      .option("readChangeFeed", "true").option("cdfKeys", "id").load()
    assert(stream.isStreaming)
    assert(stream.columns.takeRight(3).toSeq ===
      Seq("_change_type", "_commit_version", "_commit_ts"))
    val q = stream.writeStream.format("memory").queryName("graft_cdf_stream")
      .option("checkpointLocation", tmpDir("ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("graft_cdf_stream")
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === Set(
      (2L, "b", "update_preimage", 1L),
      (2L, "b2", "update_postimage", 1L),
      (3L, "c", "delete", 2L)))

    // resume: accumulate the feed into a graft sink over ONE checkpoint;
    // a commit while the stream is down arrives exactly once
    val sink = SnapshotTable(spark, tmpDir("streamcdf_sink"))
    val ckpt = tmpDir("cdf_ckpt")
    def run(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        spark.readStream.format("graft-table").option("path", root)
          .option("readChangeFeed", "true").option("cdfKeys", "id").load(), sink),
      ckpt)
    run()
    val firstCount = sink.read().count() // whole history so far
    t.update(col("id") === 1, Map("v" -> lit("a2"))) // while stream is down
    run()
    val tail = sink.read()
      .filter(col("_change_type").isin("update_preimage", "update_postimage") &&
        col("id") === 1)
      .select("v", "_change_type").as[(String, String)].collect().toSet
    assert(tail === Set(("a", "update_preimage"), ("a2", "update_postimage")))
    assert(sink.read().count() === firstCount + 2) // only the new window
    run() // caught up: nothing more
    assert(sink.read().count() === firstCount + 2)
  }

  test("streamed change feed replayed through applyChanges reconstructs the source") {
    // the replication composition: CDF STREAM accumulates into a feed
    // table, applyChanges materializes the accumulated feed into a
    // mirror — pinning that the streamed feed is interchangeable with
    // the batch readChanges feed for the downstream consumer
    val root = tmpDir("cdf_replica_src")
    val src = SnapshotTable.create(spark, root,
      Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("id", "v", "ts")) // v0
    src.update(col("id") === 2, Map("v" -> lit("b2")))                 // v1
    src.append(Seq((4L, "d", 1L)).toDF("id", "v", "ts"))               // v2
    src.delete(col("id") === 1)                                        // v3
    val feed = SnapshotTable(spark, tmpDir("cdf_replica_feed"))
    val ckpt = tmpDir("cdf_replica_ckpt")
    def drain(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        spark.readStream.format("graft-table").option("path", root)
          .option("readChangeFeed", "true").option("cdfKeys", "id").load(),
        feed),
      ckpt)
    drain()
    // the stream starts past the initial snapshot: bootstrap from v0
    val mirror = SnapshotTable(spark, tmpDir("cdf_replica_mir"))
    mirror.overwrite(src.readVersion(0))
    mirror.applyChanges(feed.read(), Seq("id"))
    def snap(t: SnapshotTable) = t.read().select("id", "v", "ts")
      .as[(Long, String, Long)].collect().toSet
    assert(snap(mirror) === snap(src), "mirror diverged from source")
    // more source commits while the stream is down; drain, replay the
    // WHOLE accumulated feed (overlapping window) — idempotent converge
    src.update(col("id") === 4, Map("v" -> lit("d2")))                 // v4
    src.delete(col("id") === 3)                                        // v5
    drain()
    mirror.applyChanges(feed.read(), Seq("id"))
    assert(snap(mirror) === snap(src), "overlapping streamed replay diverged")
  }

  test("streaming read source: startingVersion ahead of the table waits, never rewinds") {
    val root = tmpDir("streamsrc_ahead")
    val t = SnapshotTable.create(spark, root, Seq((1, "a")).toDF("id", "v")) // v0
    val sink = SnapshotTable(spark, tmpDir("streamsrc_ahead_sink"))
    val ckpt = tmpDir("ckpt")
    def run(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        spark.readStream.format("graft-table").option("path", root)
          .option("startingVersion", "2").load(), sink),
      ckpt)
    run() // table is at v0 < requested start: nothing delivered, nothing checkpointed
    assert(sink.currentVersion() === -1)
    t.append(Seq((2, "b")).toDF("id", "v")) // v1
    t.append(Seq((3, "c")).toDF("id", "v")) // v2 = the requested start
    run()
    // versions below the requested start are never delivered
    assert(sink.read().as[(Int, String)].collect().toSet === Set((3, "c")))
  }

  test("streaming read source: maxVersionsPerTrigger paces the backfill") {
    val root = tmpDir("streamsrc_rate")
    val t = SnapshotTable.create(spark, root, Seq((0, "r0")).toDF("id", "v")) // v0
    (1 to 5).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v")))        // v1..v5
    val sink = SnapshotTable(spark, tmpDir("streamsrc_rate_sink"))
    val ckpt = tmpDir("ckpt")
    def run(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        spark.readStream.format("graft-table").option("path", root)
          .option("maxVersionsPerTrigger", "2").load(), sink),
      ckpt)
    // each run covers at most 2 versions past the checkpoint; the resumed
    // source must learn its base from the replayed last-committed batch
    // (the V1 recovery contract), never rewind, never re-deliver
    run()
    assert(sink.read().count() === 2) // v0, v1
    run()
    assert(sink.read().count() === 4) // + v2, v3
    run()
    run()
    assert(sink.read().as[(Int, String)].collect().toSet ===
      (0 to 5).map(i => (i, s"r$i")).toSet)
    assert(sink.read().count() === 6) // exactly once each
  }

  test("path-based batch reads and writes through format(\"graft-table\")") {
    val root = tmpDir("batchfmt")
    val t = SnapshotTable.create(spark, root, Seq((1, "a"), (2, "b")).toDF("id", "v")) // v0
    t.append(Seq((3, "c")).toDF("id", "v"))                                            // v1
    // current snapshot
    assert(spark.read.format("graft-table").load(root).count() === 3)
    // version / timestamp time travel via options
    assert(spark.read.format("graft-table").option("versionAsOf", "0")
      .load(root).count() === 2)
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000).toString
    assert(spark.read.format("graft-table").option("timestampAsOf", ts)
      .load(root).count() === 3)
    // pushed filter still prunes through the path-based read
    assert(spark.read.format("graft-table").load(root)
      .filter($"id" === 3).select("v").as[String].collect().toSeq === Seq("c"))
    // path-based append lands an atomic table commit
    Seq((4, "d")).toDF("id", "v").write.format("graft-table")
      .mode("append").save(root)
    assert(t.read().count() === 4 && t.currentVersion() === 2)
    // writing to a pinned snapshot is refused
    val e = intercept[Exception](Seq((9, "z")).toDF("id", "v")
      .write.format("graft-table").option("versionAsOf", "0")
      .mode("append").save(root))
    assert(e.getMessage.contains("time-travel"))
    // timestampAsOf accepts a bare date and a zoned ISO instant
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC).plusDays(1).toString
    assert(spark.read.format("graft-table").option("timestampAsOf", tomorrow)
      .load(root).count() === 4)
    val iso = java.time.Instant.now().plusSeconds(60).toString
    assert(spark.read.format("graft-table").option("timestampAsOf", iso)
      .load(root).count() === 4)
    // a reader-supplied stream schema is refused (it would misbind columns)
    val se = intercept[Exception](spark.readStream.format("graft-table")
      .schema(new org.apache.spark.sql.types.StructType()
        .add("v", "string").add("id", "int"))
      .option("path", root).load())
    assert(se.getMessage.contains("user-specified schema"))
  }

  test("redelivery guard sees its stream commit through interleaved maintenance") {
    val t = SnapshotTable.create(spark, tmpDir("stream_guard"),
      Seq((1, "a")).toDF("id", "v"))
    t.appendAs(Seq((2, "b")).toDF("id", "v"), "stream-42")
    // maintenance commits land AFTER the stream commit
    t.setProperties(Map("graft.note" -> "x"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    // the guard must still recognize batch 42 as already committed — a
    // head-only check would re-apply a redelivered batch here
    assert(StreamIngest.lastStreamBatch(t) === Some(42L))
  }

  test("streaming read source fails loudly when the table schema changes mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val t = SnapshotTable.create(spark, tmpDir("streamsrc_schema"),
      Seq((1, "a")).toDF("id", "v"))
    val src = new GraftTableSource(spark, t, -1) // pins the CURRENT schema
    // a retyping overwrite lands while the stream runs
    t.overwrite(Seq((2, 7.5)).toDF("id", "v"))
    val e = intercept[IllegalStateException](
      src.getBatch(None, LongOffset(t.currentVersion())))
    assert(e.getMessage.contains("changed schema mid-stream"))
  }

  test("dedupeWithinWatermark drops redelivered rows, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val mk = (s: String) => Timestamp.valueOf(s)
    mem.addData(
      (1L, mk("2024-01-01 00:00:00"), "a"),
      (1L, mk("2024-01-01 00:00:05"), "a-dup"),   // same id within watermark
      (2L, mk("2024-01-01 00:00:10"), "b"))
    val deduped = StreamIngest.dedupeWithinWatermark(
      mem.toDF().toDF("id", "ts", "v"), "ts", Seq("id"), delay = "10 minutes")
    val sink = SnapshotTable(spark, tmpDir("dedup_sink"))
    val ckpt = tmpDir("ckpt") // ONE checkpoint — the second run resumes state
    def run(): Unit = StreamIngest.runOnce(StreamIngest.appendSink(deduped, sink), ckpt)
    run()
    assert(sink.read().select("id", "v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
    // a redelivery in a LATER batch (checkpoint-resumed run), still
    // inside the watermark — the restored per-id state must drop it
    mem.addData((1L, mk("2024-01-01 00:00:20"), "a-dup2"))
    run()
    val got = sink.read().select("id", "v").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "b")), s"got $got")
  }

  test("sketch aggregates run inside watermarked streaming windows") {
    // the KMV TypedImperativeAggregate must serialize through streaming
    // state: windowed distinct-user counts, append mode, exact regime —
    // a second run (checkpoint resume) must merge restored window state
    // with new rows before the watermark closes the window
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val mk = (s: String) => Timestamp.valueOf(s)
    mem.addData(
      (1L, mk("2024-01-01 00:01:00")),
      (2L, mk("2024-01-01 00:02:00")),
      (1L, mk("2024-01-01 00:03:00")), // dup user inside the window
      (3L, mk("2024-01-01 00:59:00")))
    val counted = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.ext.functions.kmvDistinct(col("user_id"), 1024).as("nd_users"))
      .select(col("w.start").as("ws"), col("nd_users"))
    val sink = SnapshotTable(spark, tmpDir("sketch_sink"))
    val ckpt = tmpDir("ckpt_sketch") // ONE checkpoint: run 2 resumes state
    def run(): Unit = StreamIngest.runOnce(StreamIngest.appendSink(counted, sink), ckpt)
    run()
    // window [00:00, 01:00) not yet closed: nothing emitted
    assert(sink.currentVersion() < 0 || sink.read().count() === 0)
    // one more distinct user in-window, plus an event far enough ahead
    // to push the watermark past the window end
    mem.addData(
      (4L, mk("2024-01-01 00:30:00")),
      (9L, mk("2024-01-01 02:30:00")))
    run()
    val rows = sink.read().as[(Timestamp, Long)].collect().toMap
    // restored sketch state {1,2,3} merged with {4} → exactly 4 distinct
    assert(rows(mk("2024-01-01 00:00:00")) === 4L)
  }

  test("sessionization with flatMapGroupsWithState emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val mk = (s: String) => Timestamp.valueOf(s)
    // user 1: two events 5 min apart (one session), then nothing until the
    // watermark (driven by user 2's late event) passes the 30-min gap
    mem.addData(
      (1L, mk("2024-01-01 00:00:00"), 1.0),
      (1L, mk("2024-01-01 00:05:00"), 2.0),
      (2L, mk("2024-01-01 02:00:00"), 9.0))
    val sessions = StreamIngest.sessionize(
      mem.toDF().toDF("user_id", "ts", "value"), "ts", "user_id")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // second batch advances the watermark → user 1's session times out
    mem.addData((2L, mk("2024-01-01 03:00:00"), 1.0))
    val q2 = sessions.writeStream
      .format("memory").queryName("sessions_out2")
      .option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val got = spark.table("sessions_out").unionByName(spark.table("sessions_out2"))
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 3.0)), s"got $got")
  }

  test("watermarked windowed aggregation over the events stream shape") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:10")
    val t1 = Timestamp.valueOf("2024-01-01 00:00:40")
    val t2 = Timestamp.valueOf("2024-01-01 00:05:00") // advances watermark
    mem.addData((t0, 1L, 2.0), (t1, 1L, 3.0), (t2, 2L, 1.0))
    val agg = StreamIngest.windowedCounts(
      mem.toDF().toDF("ts", "user_id", "value"), "ts", "user_id")
    val table = SnapshotTable(spark, tmpDir("stream"))
    StreamIngest.runOnce(StreamIngest.appendSink(agg, table), tmpDir("ckpt"))
    // window [00:00, 01:00) for user 1 is finalized by the watermark
    val rows = table.read()
      .select("user_id", "n", "sum_value").as[(Long, Long, Double)].collect().toSet
    assert(rows.contains((1L, 2L, 5.0)), s"got $rows")
  }

  test("drained graft source runs one finalization batch: closed windows emit without new commits") {
    // The AvailableNow no-data problem: a run that ends on a data batch
    // advances the watermark but never runs the batch in which the
    // now-closed windows emit. The source's odd flush offsets provide
    // that batch on the next run — no sentinel commit required.
    val root = tmpDir("stream_final")
    val src = SnapshotTable.create(spark, root, Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "a"),
      (Timestamp.valueOf("2024-01-01 00:20:00"), "b")).toDF("ts", "k"))
    // late row pushes the watermark (1h) past the [00:00, 01:00) window
    src.append(Seq((Timestamp.valueOf("2024-01-01 03:00:00"), "late"))
      .toDF("ts", "k"))
    val out = SnapshotTable(spark, tmpDir("stream_final_out"))
    val ckpt = tmpDir("stream_final_ckpt")
    def run(): Unit = StreamIngest.runOnce(
      StreamIngest.appendSink(
        StreamIngest.windowedCounts(
          spark.readStream.format("graft-table").option("path", root).load()
            .withColumn("value", lit(0.0)),
          tsCol = "ts", keyCol = "k", window = "1 hour", watermark = "1 hour")
          .select(col("window_start"), col("k"), col("n")), out),
      ckpt)
    run() // drains both commits; watermark advances AFTER the batch
    val sinkV1 = out.currentVersion()
    run() // NO new source commits: the flush batch finalizes the windows
    val rows = out.read().select("k", "n").as[(String, Long)].collect().toSet
    assert(rows === Set(("a", 1L), ("b", 1L)), s"got $rows")
    // a third drained run must be a no-op: the flush offset is
    // checkpointed, so it is not re-offered, and empty batches never
    // commit junk versions to the sink table
    val sinkV2 = out.currentVersion()
    run()
    assert(out.currentVersion() === sinkV2)
    assert(out.read().select("k", "n").as[(String, Long)].collect().toSet === rows)
    assert(sinkV2 > sinkV1) // the finalization batch itself DID commit
  }
}
