package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Disjoint-READ-SET OCC for row-level rewrites (UPDATE/DELETE/MERGE) —
 * Delta's ConcurrentAppend-vs-ConcurrentDeleteRead distinction at
 * file-stats granularity: a rewrite losing the commit race to a commit
 * whose files provably hold no row in the op's key range rebases and
 * commits instead of recomputing; anything that could have changed the
 * op's matched/not-matched routing (overlapping keys, a touched source
 * file, metadata/DV/delta changes, stats-blind predicates, identity
 * tables) still conflicts. Deterministic single-JVM injections first
 * (the [[MaintenanceRaceSpec]] pattern), then a threaded real-API race
 * of two disjoint MERGEs that must BOTH commit without a retry loop.
 */
class RowRewriteRebaseSpec extends SparkSpec {
  import spark.implicits._

  /** Three key-clustered files: [0,1000), [1000,2000), [2000,3000). */
  private def rangedTable(prefix: String): SnapshotTable = {
    def slab(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
      .withColumn("v", lit("a")).repartitionByRange(1, col("id"))
    val t = SnapshotTable.create(spark, tmpDir(prefix), slab(0, 1000))
    t.append(slab(1000, 2000))
    t.append(slab(2000, 3000))
    t
  }

  test("row rewrite rebases past a key-disjoint interleaved append") {
    val t = rangedTable("rr_rebase")
    val v = t.currentVersion()
    val entry = t.commitEntry(v)
    // a DELETE of id < 10 computed against the pinned snapshot
    val touched = t.prunedManifest(col("id") < 10).toSet
    assert(touched.size === 1, "fixture must prune to the low file")
    val keep = entry.files.map(_.path).filterNot(touched)
    val rewritten = spark.read.parquet(touched.toSeq: _*).filter(col("id") >= 10)
    // ...an append with keys far outside the predicate lands in between
    t.append(spark.range(5000, 5100).toDF("id").withColumn("v", lit("n"))
      .repartitionByRange(1, col("id")))
    // ...and the delete commit REBASES (appended file stats-disjoint
    // from the read set) instead of surfacing the conflict
    t.replaceFiles(keep, rewritten, "delete",
      expectVersion = Some(v), rebasePredicate = Some(col("id") < 10))
    assert(t.currentVersion() === v + 2)
    val ids = t.read().select("id").as[Long].collect().toSet
    assert(ids === ((10L until 3000L) ++ (5000L until 5100L)).toSet,
      "rebased delete lost or resurrected rows")
  }

  test("row rewrite conflicts when interleaved keys overlap its range") {
    val t = rangedTable("rr_overlap")
    val v = t.currentVersion()
    val entry = t.commitEntry(v)
    val touched = t.prunedManifest(col("id") < 10).toSet
    val keep = entry.files.map(_.path).filterNot(touched)
    val rewritten = spark.read.parquet(touched.toSeq: _*).filter(col("id") >= 10)
    // the interleaved append INSERTS keys inside the predicate range —
    // rows this delete should have seen; rebasing would miss them
    t.append(Seq((3L, "late"), (7L, "late")).toDF("id", "v"))
    intercept[SnapshotTable.ConcurrentCommitException] {
      t.replaceFiles(keep, rewritten, "delete",
        expectVersion = Some(v), rebasePredicate = Some(col("id") < 10))
    }
  }

  test("row rewrite conflicts on a stats-blind predicate and on a touched source") {
    // stats-blind: no conjunct of the predicate is stats-evaluable, so
    // every added file "may match" — must degrade to a conflict
    val t1 = rangedTable("rr_blind")
    val v1 = t1.currentVersion()
    val e1 = t1.commitEntry(v1)
    val touched1 = t1.prunedManifest(col("id") < 10).toSet
    val rw1 = spark.read.parquet(touched1.toSeq: _*).filter(col("id") >= 10)
    t1.append(Seq((6000L, "x")).toDF("id", "v"))
    intercept[SnapshotTable.ConcurrentCommitException] {
      t1.replaceFiles(e1.files.map(_.path).filterNot(touched1), rw1, "delete",
        expectVersion = Some(v1),
        rebasePredicate = Some(length(col("v")) > 100))
    }
    // touched source: the interleave rewrote a file this op read AND is
    // replacing — ConcurrentDeleteRead class, never rebases
    val t2 = rangedTable("rr_src")
    val v2 = t2.currentVersion()
    val e2 = t2.commitEntry(v2)
    val touched2 = t2.prunedManifest(col("id") < 10).toSet
    val rw2 = spark.read.parquet(touched2.toSeq: _*).filter(col("id") >= 10)
    t2.delete(col("id") === 5) // rewrites the SAME low file
    intercept[SnapshotTable.ConcurrentCommitException] {
      t2.replaceFiles(e2.files.map(_.path).filterNot(touched2), rw2, "delete",
        expectVersion = Some(v2), rebasePredicate = Some(col("id") < 10))
    }
  }

  test("identity-bearing tables never rebase row rewrites") {
    // insert rows took identity values from base's high-water mark; any
    // interleaved write may have advanced it — the safety predicate must
    // refuse even a files-only interleaved commit
    val base = SnapshotTable.CommitEntry("merge", "{}", Nil,
      properties = Some(Map("graft.identity.id" -> "0,1,false")))
    val head = base.copy(action = "append")
    val t = SnapshotTable(spark, tmpDir("rr_identity"))
    assert(!t.rowRewriteRebaseSafe(base, head, Set.empty, lit(false)),
      "identity tables must surface the conflict instead of rebasing")
    // without identity properties the same (added-nothing) shape is safe
    val plain = base.copy(properties = None)
    assert(t.rowRewriteRebaseSafe(plain, plain.copy(action = "append"),
      Set.empty, lit(false)))
  }

  test("rebase guard checks files the interleave REMOVED, not just added") {
    // the insert-only MERGE shape: sources=∅ (nothing rewritten) but the
    // anti-join READ the whole target — an interleaved commit that
    // dropped a file whose stats may hold one of the merge's source keys
    // could have flipped that key from matched to not-matched, so the
    // delete-first serial order inserts it and a silent rebase loses it
    // (Delta's ConcurrentDeleteRead). Head removes the low file wholesale
    // and adds NOTHING, so only the removed-files side of the guard can
    // catch it.
    val t = rangedTable("rr_removed")
    val v = t.currentVersion()
    val base = t.commitEntry(v)
    val lowPaths = t.prunedManifest(col("id") < 10).toSet
    assert(lowPaths.size === 1, "fixture must prune to the low file")
    val head = base.copy(action = "delete",
      files = base.files.filterNot(f => lowPaths(f.path)))
    assert(!t.rowRewriteRebaseSafe(base, head, Set.empty,
      col("id") >= 500 && col("id") <= 3500),
      "a removed may-match file must surface the ConcurrentDeleteRead conflict")
    // ...while key bounds provably outside every removed file still rebase
    assert(t.rowRewriteRebaseSafe(base, head, Set.empty,
      col("id") >= 3200 && col("id") <= 3500))
  }

  test("insert-only MERGE commit conflicts when an interleaved delete hit its key range") {
    // end-to-end through replaceFiles exactly as Merge's insert-only
    // branch calls it: keep = ALL files, sources = ∅, rebase guarded only
    // by the source-key bounds. The interleaved delete rewrote the file
    // holding a matched source key — commit must conflict, and the
    // caller's retry (fresh snapshot: 500 now unmatched) inserts it.
    val t = rangedTable("rr_insonly")
    val v = t.currentVersion()
    val allFiles = t.commitEntry(v).files.map(_.path)
    // computed against v: source keys {500, 3500}; 500 matched → excluded
    val inserts = Seq((3500L, "i")).toDF("id", "v")
    val bounds = col("id") >= 500 && col("id") <= 3500
    t.delete(col("id") === 500)
    intercept[SnapshotTable.ConcurrentCommitException] {
      t.replaceFiles(allFiles, inserts, "merge",
        expectVersion = Some(v), rebasePredicate = Some(bounds))
    }
  }

  test("insert-only MERGE racing a delete of a matched key serializes in commit order") {
    // Real-API race: thread A deletes id=500, thread B runs an
    // insert-only MERGE whose source holds {500, 3500} (500 matched at
    // B's snapshot, 3500 fresh). B retries on conflict like any caller.
    // Whatever interleaving happens, the final state must equal the
    // SERIAL execution in COMMIT order: if the delete committed before
    // the merge's successful commit, the merge recomputed and re-inserted
    // 500 (the lost-insert case the removed-files rebase guard exists
    // for); if the merge landed first, the delete then removed 500.
    val root = tmpDir("rr_insonly_race")
    def slab(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
      .withColumn("v", lit("a")).repartitionByRange(1, col("id"))
    val seed = SnapshotTable.create(spark, root, slab(0, 1000))
    seed.append(slab(1000, 2000))
    seed.append(slab(2000, 3000))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    def run(name: String)(body: => Unit): Thread = {
      val th = new Thread(() => {
        try { gate.await(); body }
        catch { case e: Throwable => errors.add(e); () }
      }, name)
      th.start(); th
    }
    val deleter = run("race-delete") {
      SnapshotTable(spark, root).delete(col("id") === 500)
    }
    val merger = run("race-merge") {
      val src = Seq((500L, "m"), (3500L, "m")).toDF("id", "nv")
      var attempts = 0
      var done = false
      while (!done) {
        try {
          SnapshotTable(spark, root).merge(src, col("t.id") === col("s.id"))
            .whenNotMatched().insert(Map("id" -> col("s.id"), "v" -> col("s.nv")))
            .execute()
          done = true
        } catch {
          case _: SnapshotTable.ConcurrentCommitException if attempts < 5 =>
            attempts += 1
        }
      }
    }
    gate.countDown()
    deleter.join(120000)
    merger.join(120000)
    assert(errors.isEmpty, s"race errored: ${errors.toArray.mkString("; ")}")
    val t = SnapshotTable(spark, root)
    val hist = t.history().reverse // oldest first
    val deleteV = hist.find(_.action == "delete").get.version
    val mergeV = hist.filter(_.action == "merge").map(_.version).max
    val ids = t.read().select("id").as[Long].collect().toSet
    assert(ids.contains(3500L), "fresh insert lost")
    if (deleteV < mergeV)
      assert(ids.contains(500L),
        "delete committed first: the merge must have re-inserted 500 " +
          "(a silent rebase would have lost it)")
    else
      assert(!ids.contains(500L),
        "merge committed first: the later delete must have removed 500")
  }

  test("randomized trials: a permitted rebase always equals the commit-order recompute") {
    // Property the guard must uphold, sampled across random geometries:
    // when a row rewrite computed against v0 loses the race to an
    // interleaved commit and the guard PERMITS the rebase, the resulting
    // table must be byte-identical to recomputing the op against the
    // interleaved head (commit-order serializability); when the guard
    // refuses, a recompute-retry must land the same state. Ops sampled:
    // range DELETE and insert-only MERGE; interleaves sampled: disjoint
    // append, overlapping append, range delete. Seeded for reproducibility.
    val rnd = new scala.util.Random(20260815L)
    def slab(lo: Long, hi: Long, tag: String) = spark.range(lo, hi).toDF("id")
      .withColumn("v", lit(tag)).repartitionByRange(1, col("id"))
    var rebased, conflicted = 0 // the sample must hit BOTH guard outcomes
    (1 to 12).foreach { trial =>
      val root = tmpDir(s"rr_prop_$trial")
      val t = SnapshotTable.create(spark, root, slab(0, 1000, "a"))
      t.append(slab(1000, 2000, "a"))
      t.append(slab(2000, 3000, "a"))
      var model = (0L until 3000L).toSet // driver-side oracle of live ids
      val v0 = t.currentVersion()
      val e0 = t.commitEntry(v0)
      // op B computed against v0
      val mergeShaped = rnd.nextBoolean()
      val (bLo, bHi) = { val x = rnd.nextInt(9000); (x.toLong, (x + 1 + rnd.nextInt(500)).toLong) }
      val bPred = col("id") >= bLo && col("id") <= bHi
      val (keep0, df0) =
        if (!mergeShaped) { // range DELETE
          val touched = t.prunedManifest(bPred).toSet
          (e0.files.map(_.path).filterNot(touched),
            if (touched.isEmpty) null // nothing touched at v0: B never commits
            else spark.read.parquet(touched.toSeq: _*).filter(!bPred))
        } else { // insert-only MERGE: insert {bLo, bHi} where absent at v0
          val inserts = Seq(bLo, bHi).filterNot(model.contains)
            .map((_, "m")).toDF("id", "v")
          (e0.files.map(_.path), inserts)
        }
      // interleave A via the real API
      rnd.nextInt(3) match {
        case 0 => // append stats-disjoint from everything live
          val lo = 10000L + rnd.nextInt(1000)
          t.append(slab(lo, lo + 100, "n")); model ++= (lo until lo + 100)
        case 1 if bLo >= 3200 => // append INSIDE B's key range (conflict bait)
          t.append(slab(bLo, bLo + 50, "n")); model ++= (bLo until bLo + 50)
        case 1 => // B's range overlaps live rows: high-disjoint append instead
          val lo = 12000L + rnd.nextInt(1000)
          t.append(slab(lo, lo + 100, "n")); model ++= (lo until lo + 100)
        case 2 => // range delete
          val dLo = rnd.nextInt(3000).toLong; val dHi = dLo + 1 + rnd.nextInt(400)
          t.delete(col("id") >= dLo && col("id") <= dHi)
          model = model.filterNot(i => i >= dLo && i <= dHi)
      }
      // expected = COMMIT-ORDER serial execution: A (already folded into
      // model), then B recomputed against the post-A state. A delete that
      // touched nothing at v0 never commits at all (the real API returns 0
      // without a commit), so its serial position is before A.
      val expected =
        if (!mergeShaped && df0 == null) model
        else if (!mergeShaped) model.filterNot(i => i >= bLo && i <= bHi)
        else model ++ Seq(bLo, bHi).filterNot(model.contains)
      // attempt B's stale commit; on conflict, recompute against head
      def commitStale(): Unit =
        if (!mergeShaped && df0 == null) () // B touched nothing at v0: no-op
        else t.replaceFiles(keep0, df0, if (mergeShaped) "merge" else "delete",
          expectVersion = Some(v0), rebasePredicate = Some(bPred))
      try { commitStale(); if (df0 != null || mergeShaped) rebased += 1 }
      catch {
        case _: SnapshotTable.ConcurrentCommitException =>
          conflicted += 1
          if (!mergeShaped) t.delete(bPred)
          else {
            val live = t.read().select("id").as[Long].collect().toSet
            val ins = Seq(bLo, bHi).filterNot(live.contains).map((_, "m")).toDF("id", "v")
            if (!ins.isEmpty) t.append(ins)
          }
      }
      val got = t.read().select("id").as[Long].collect()
      assert(got.length === got.distinct.length,
        s"trial $trial duplicated ids (mergeShaped=$mergeShaped range=[$bLo,$bHi])")
      assert(got.toSet === expected,
        s"trial $trial diverged from commit-order serial state " +
          s"(mergeShaped=$mergeShaped range=[$bLo,$bHi]): " +
          s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
    }
    assert(rebased >= 1 && conflicted >= 1,
      s"seed must exercise both guard outcomes (rebased=$rebased conflicted=$conflicted)")
  }

  test("two concurrent MERGEs on disjoint key ranges both commit without recompute") {
    // the real API end-to-end: each merge's key-bounds predicate comes
    // from its own source agg (MergeInto.discoveryCandidates), and the
    // commit-race loser must REBASE — no ConcurrentCommitException may
    // surface, no retry wrapper is provided
    val root = tmpDir("rr_merge_race")
    def slab(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
      .withColumn("v", lit("a")).repartitionByRange(1, col("id"))
    val seed = SnapshotTable.create(spark, root, slab(0, 1000))
    seed.append(slab(1000, 2000))
    seed.append(slab(2000, 3000))
    (1 to 2).foreach { round =>
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      def merger(name: String, lo: Long, hi: Long, tag: String): Thread = {
        val th = new Thread(() => {
          try {
            gate.await()
            val t = SnapshotTable(spark, root)
            val src = spark.range(lo, hi).toDF("id")
              .withColumn("nv", lit(tag))
            t.merge(src, col("t.id") === col("s.id"))
              .whenMatched().update(Map("v" -> col("s.nv")))
              .execute()
          } catch { case e: Throwable => errors.add(e); () }
        }, name)
        th.start(); th
      }
      val a = merger(s"merge-low-$round", 0, 100, s"low$round")
      val b = merger(s"merge-high-$round", 2500, 2600, s"high$round")
      gate.countDown()
      a.join(120000)
      b.join(120000)
      assert(errors.isEmpty,
        s"disjoint merges must not conflict: ${errors.toArray.mkString("; ")}")
      val t = SnapshotTable(spark, root)
      val got = t.read().filter(col("v") =!= "a")
        .select("id", "v").as[(Long, String)].collect().toSet
      assert(got === ((0L until 100L).map(i => (i, s"low$round")) ++
        (2500L until 2600L).map(i => (i, s"high$round"))).toSet,
        "merge lost under the race")
      assert(t.read().count() === 3000)
    }
  }
}
