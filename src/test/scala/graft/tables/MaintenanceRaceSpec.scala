package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Disjoint-file OCC for MAINTENANCE commits (Delta's conflict-rule set):
 * compaction / Z-order / delta-fold losing the commit race to a commit
 * that never touched their read set — the steady state of scheduled
 * maintenance beside ingest — rebases and commits instead of surfacing
 * [[SnapshotTable.ConcurrentCommitException]]; anything that DID touch
 * the read set, the metadata, or the DV/delta overlays still conflicts.
 * Deterministic single-JVM injections first, then the forked-two-JVM
 * race ([[MaintRaceChild]], the [[OccRaceSpec]] pattern).
 */
class MaintenanceRaceSpec extends SparkSpec {
  import spark.implicits._

  private def threeFileTable(prefix: String): SnapshotTable = {
    val root = tmpDir(prefix)
    val t = SnapshotTable.create(spark, root, Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t
  }

  test("compaction absorbs an interleaved blind append (disjoint rebase)") {
    val t = threeFileTable("maint_rebase")
    val v = t.currentVersion()
    val entry = t.commitEntry(v)
    // the maintenance op computes its rewrite against the pinned snapshot
    val packed = spark.read.parquet(entry.files.map(_.path): _*).coalesce(1)
    // ...an append lands between that read and the maintenance commit
    t.append(Seq((4, "d")).toDF("id", "v"))
    val appendedPaths = t.commitEntry(v + 1).files.map(_.path).toSet --
      entry.files.map(_.path)
    // ...and the commit rebases instead of conflicting: all sources are
    // intact at the head, the interleaved commit only added a file
    t.replaceFiles(Nil, packed, "compact",
      expectVersion = Some(v), rebaseDisjoint = true)
    assert(t.currentVersion() === v + 2)
    // serial-equivalent result: exactly the compact-then-append rows —
    // and exactly ONCE each (a carried-forward file duplicated into the
    // rewrite would survive a toSet-only comparison)
    val compactRows = t.read().as[(Int, String)].collect()
    assert(compactRows.length === compactRows.toSet.size)
    assert(compactRows.toSet ===
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // the appended file rode through the rebase un-rewritten; every
    // compacted source is gone from the head manifest
    val head = t.commitEntry(t.currentVersion())
    assert(appendedPaths.subsetOf(head.files.map(_.path).toSet))
    assert(entry.files.map(_.path).forall(p => !head.files.exists(_.path == p)))
  }

  test("recluster-shape rewrite absorbs an interleaved blind append") {
    // recluster's exact replaceFiles flag set — full replace (keep=Nil),
    // numFiles pin, clearDvFiles, prior-schema commit — must interact
    // with the disjoint-file rebase the same way compact's does: the
    // interleaved append's file rides through un-rewritten, nothing
    // doubles, and the committed schema stays the prior one verbatim
    val t = threeFileTable("recluster_rebase")
    val v = t.currentVersion()
    val entry = t.commitEntry(v)
    val all = spark.read.parquet(entry.files.map(_.path): _*)
      .repartitionByRange(2, col("id"))
    t.append(Seq((4, "d")).toDF("id", "v"))
    val appendedPaths = t.commitEntry(v + 1).files.map(_.path).toSet --
      entry.files.map(_.path)
    t.replaceFiles(Nil, all, "recluster", expectVersion = Some(v),
      numFiles = Some(2), rebaseDisjoint = true, clearDvFiles = true,
      commitSchemaJson = Some(entry.schemaJson))
    val rows = t.read().as[(Int, String)].collect()
    assert(rows.length === rows.toSet.size)
    assert(rows.toSet === Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    val head = t.commitEntry(t.currentVersion())
    assert(head.action === "recluster")
    assert(appendedPaths.subsetOf(head.files.map(_.path).toSet))
    assert(head.schemaJson === entry.schemaJson, "rebase loosened the schema")
  }

  test("z-order absorbs an interleaved blind append") {
    val t = threeFileTable("zorder_rebase")
    val v = t.currentVersion()
    val relayout = t.read().orderBy("id").coalesce(1) // pins v's file list
    t.append(Seq((4, "d")).toDF("id", "v"))
    t.overwritePreClustered(relayout, "optimize-zorder",
      expectVersion = Some(v), rebaseDisjoint = true)
    val zRows = t.read().as[(Int, String)].collect()
    assert(zRows.length === zRows.toSet.size) // no duplicated carried row
    assert(zRows.toSet ===
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    assert(t.commitEntry(t.currentVersion()).action === "optimize-zorder")
  }

  test("rebase refuses when the interleaved commit touched a source file") {
    val t = threeFileTable("maint_conflict_src")
    val v = t.currentVersion()
    val entry = t.commitEntry(v)
    val packed = spark.read.parquet(entry.files.map(_.path): _*).coalesce(1)
    // the interleaved commit REWRITES one of the compaction's sources —
    // its content is already stale in `packed`, so this must conflict
    t.delete(col("id") === 2)
    intercept[SnapshotTable.ConcurrentCommitException] {
      t.replaceFiles(Nil, packed, "compact",
        expectVersion = Some(v), rebaseDisjoint = true)
    }
    assert(t.read().as[(Int, String)].collect().toSet === Set((1, "a"), (3, "c")))
  }

  test("rebase refuses metadata, delta, and DV interleavings") {
    // metadata: a property change invalidates what the rewrite validated
    val t1 = threeFileTable("maint_conflict_meta")
    val v1 = t1.currentVersion()
    val p1 = spark.read.parquet(t1.commitEntry(v1).files.map(_.path): _*).coalesce(1)
    t1.setProperties(Map("owner" -> "x"))
    intercept[SnapshotTable.ConcurrentCommitException] {
      t1.replaceFiles(Nil, p1, "compact", expectVersion = Some(v1), rebaseDisjoint = true)
    }
    // deltas: an interleaved upsertDeferred's overlay would be silently
    // cleared by the rebased commit — conflict instead
    val t2 = SnapshotTable.create(spark, tmpDir("maint_conflict_delta"),
      Seq((1, "a", 0L)).toDF("id", "v", "ts"))
    t2.append(Seq((2, "b", 0L)).toDF("id", "v", "ts"))
    val v2 = t2.currentVersion()
    val p2 = spark.read.parquet(t2.commitEntry(v2).files.map(_.path): _*).coalesce(1)
    t2.upsertDeferred(Seq((2, "b2", 1L)).toDF("id", "v", "ts"),
      keys = Seq("id"), precombine = "ts")
    intercept[SnapshotTable.ConcurrentCommitException] {
      t2.replaceFiles(Nil, p2, "compact", expectVersion = Some(v2), rebaseDisjoint = true)
    }
  }

  test("delta-fold (applyDeltas shape) absorbs an interleaved append") {
    // the compact-deltas action goes through the same rebase: fold the
    // pinned snapshot's deltas while an append lands — result equals the
    // fold-then-append serial schedule
    val root = tmpDir("fold_rebase")
    val t = SnapshotTable.create(spark, root,
      Seq((1, "a", 0L), (2, "b", 0L)).toDF("id", "v", "ts"))
    t.upsertDeferred(Seq((2, "b2", 1L)).toDF("id", "v", "ts"),
      keys = Seq("id"), precombine = "ts")
    // pin, compute the fold, then interleave an append
    val v = t.currentVersion()
    // read() resolves the file list at CONSTRUCTION, so this frame is
    // the merged view of the pinned snapshot even after the append lands
    val folded = t.read().coalesce(1)
    t.append(Seq((9, "z", 0L)).toDF("id", "v", "ts"))
    // a REAL applyDeltas computed now would see the appended head; this
    // drives the same commit shape through the pinned-version path
    t.replaceFiles(Nil, folded, "compact-deltas",
      expectVersion = Some(v), rebaseDisjoint = true)
    assert(t.read().as[(Int, String, Long)].collect().toSet ===
      Set((1, "a", 0L), (2, "b2", 1L), (9, "z", 0L)))
  }

  test("threaded mixed race: appends + compact + z-order, nothing lost or doubled") {
    // in-JVM stress of the combined conflict rules: two appenders (blind
    // appends auto-rebase past file-only commits) race one maintenance
    // thread alternating compaction and z-order (both rebase past
    // disjoint appends). Serializability criterion: every appended row
    // present exactly once at the end, contiguous log, readable head.
    val root = tmpDir("mixed_race")
    SnapshotTable.create(spark, root,
      Seq(("seed", 0, 0)).toDF("writer", "n", "n2"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def worker(name: String)(body: SnapshotTable => Unit): Thread = {
      val th = new Thread(() => {
        try body(SnapshotTable(spark, root))
        catch { case e: Throwable => errors.add(e); () }
      }, name)
      th.start(); th
    }
    def retrying(op: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        require(attempts <= 100, "starved")
        try { op; done = true }
        catch { case _: SnapshotTable.ConcurrentCommitException => Thread.sleep(2) }
      }
    }
    val a = worker("appender-a") { t =>
      (1 to 12).foreach { i =>
        retrying(t.append(Seq((s"a$i", i, i * 7)).toDF("writer", "n", "n2")))
        Thread.sleep(3)
      }
    }
    val b = worker("appender-b") { t =>
      (1 to 12).foreach { i =>
        retrying(t.append(Seq((s"b$i", i, i * 3)).toDF("writer", "n", "n2")))
        Thread.sleep(3)
      }
    }
    val m = worker("maintenance") { t =>
      (1 to 6).foreach { i =>
        retrying {
          if (i % 2 == 0) { t.compact(1L << 30, 1L << 30); () }
          else graft.ext.ZOrder.optimize(t, Seq("n", "n2"), 1)
        }
        Thread.sleep(10)
      }
    }
    Seq(a, b, m).foreach(_.join(120000))
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    val t = SnapshotTable(spark, root)
    val rows = t.read().as[(String, Int, Int)].collect().toSeq
    assert(rows.size === rows.toSet.size, "duplicated rows")
    assert(rows.toSet === (("seed", 0, 0) +:
      ((1 to 12).map(i => (s"a$i", i, i * 7)) ++
        (1 to 12).map(i => (s"b$i", i, i * 3)))).toSet,
      "lost or phantom rows")
    val versions = t.history().map(_.version).sorted
    assert(versions === (versions.head to versions.last))
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two forked JVMs: ingest appends land mid-compaction, both commit") {
    val root = tmpDir("maint_fork")
    SnapshotTable.create(spark, root, Seq(("seed", 0)).toDF("writer", "n"))
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    def spawn(role: String, iters: Int): Process = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1g", "-Dspark.ui.enabled=false",
        "-cp", cp, "graft.tables.MaintRaceChild", root, role, iters.toString)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      pb.start()
    }
    val appends = 25
    val ingest = spawn("ingest", appends)
    val maint = spawn("maint", 5)
    import java.util.concurrent.TimeUnit
    assert(ingest.waitFor(300, TimeUnit.SECONDS), "ingest timed out")
    assert(maint.waitFor(300, TimeUnit.SECONDS), "maintenance timed out")
    assert(ingest.exitValue() === 0, "ingest failed")
    assert(maint.exitValue() === 0, "maintenance failed")

    val t = SnapshotTable(spark, root)
    // no lost appends, no duplicated rows, through every interleaving
    val rows = t.read().as[(String, Int)].collect().toSeq
    assert(rows.size === rows.toSet.size, "duplicated rows")
    assert(rows.toSet === (("seed", 0) +:
      (1 to appends).map(i => (s"a$i", i))).toSet, "lost or phantom rows")
    // the log is a contiguous tail with at least one compaction landed
    val versions = t.history().map(_.version).sorted
    assert(versions === (versions.head to versions.last))
    assert(t.history().exists(_.action == "compact"), "no compaction committed")
    // the race genuinely interleaved (the ingest child gates on it, the
    // log proves it): appends landed BOTH before and after a compaction
    val hist = t.history()
    val compactVs = hist.filter(_.action == "compact").map(_.version)
    val appendVs = hist.filter(_.action == "append").map(_.version)
    assert(appendVs.min < compactVs.min, "no append before the first compaction")
    assert(appendVs.max > compactVs.min, "no append after a compaction")
    // maintenance left the table fully readable after an aggressive GC
    t.vacuum(retainVersions = 1, retainMillis = 0L)
    assert(t.read().count() === appends + 1)
  }
}
