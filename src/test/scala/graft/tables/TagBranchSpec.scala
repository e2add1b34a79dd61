package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named refs: immutable tags, branch fork/isolation, and the
 *  write-audit-publish fast-forward (SnapshotTable's Iceberg-refs role). */
class TagBranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): SnapshotTable =
    SnapshotTable.create(spark, tmpDir(prefix),
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))

  test("tags pin versions, are immutable, and resolve through readTag") {
    val t = freshTable("tag_basic")
    t.createTag("v0-audit")
    t.append(Seq((11L, "v11")).toDF("id", "v"))
    t.createTag("after-append", asOfVersion = Some(t.currentVersion()))
    assert(t.tagVersion("v0-audit") === 0L)
    assert(t.readTag("v0-audit").count() === 10)
    assert(t.readTag("after-append").count() === 11)
    assert(t.listTags() === Seq("after-append" -> 1L, "v0-audit" -> 0L))
    // immutable: re-tagging the same name fails loudly
    val e = intercept[IllegalArgumentException](t.createTag("v0-audit"))
    assert(e.getMessage.contains("immutable"))
    t.dropTag("v0-audit")
    assert(t.listTags().map(_._1) === Seq("after-append"))
    intercept[Exception](t.readTag("v0-audit"))
  }

  test("tag targets must be readable commits and names must be path-safe") {
    val t = freshTable("tag_guard")
    intercept[Exception](t.createTag("ghost", asOfVersion = Some(99L)))
    intercept[IllegalArgumentException](t.createTag("../escape"))
    intercept[IllegalArgumentException](t.createTag(".hidden"))
  }

  test("branch writes are invisible to main until fastForward publishes them") {
    val t = freshTable("br_wap")
    val b = t.createBranch("audit")
    // fork is zero-copy: branch head serves the exact same files
    assert(b.manifest().toSet === t.manifest().toSet)
    b.append(Seq((11L, "v11"), (12L, "v12")).toDF("id", "v"))
    // isolation both ways
    assert(t.read().count() === 10)
    assert(b.read().count() === 12)
    assert(t.currentVersion() === 0L)
    // publish: one squash commit lands the audited manifest on main
    t.fastForward("audit")
    assert(t.read().count() === 12)
    assert(t.currentVersion() === 1L)
    // zero-copy publish: main now references the branch's data files
    assert(t.manifest().toSet === b.manifest().toSet)
    val action = t.history().head.action
    assert(action.startsWith("publish-branch:audit@"), action)
  }

  test("fastForward loses the CAS when main advanced since the fork") {
    val t = freshTable("br_race")
    val b = t.createBranch("audit")
    b.append(Seq((11L, "v11")).toDF("id", "v"))
    t.append(Seq((99L, "v99")).toDF("id", "v")) // main advances first
    intercept[SnapshotTable.ConcurrentCommitException](t.fastForward("audit"))
    // main is unharmed and still serves its own lineage
    assert(t.read().count() === 11)
    assert(t.read().filter(col("id") === 99).count() === 1)
  }

  test("vacuum on main never reclaims unpublished branch files; dropBranch releases them") {
    val t = freshTable("br_vac")
    val b = t.createBranch("wip")
    b.overwrite((1 to 5).map(i => (i.toLong, s"w$i")).toDF("id", "v"))
    val branchFiles = b.manifest().toSet
    assert(branchFiles.intersect(t.manifest().toSet).isEmpty)
    // aggressive retention: only the branch ref keeps these files alive
    assert(t.vacuum(retainVersions = 1, retainMillis = 0L) === 0)
    assert(b.read().count() === 5)
    t.dropBranch("wip")
    assert(t.listBranches().isEmpty)
    // now they are orphans and reclaimable
    val dropped = t.vacuum(retainVersions = 1, retainMillis = 0L)
    assert(dropped === branchFiles.size, s"$dropped != ${branchFiles.size}")
    assert(t.read().count() === 10) // main lineage untouched
  }

  test("branch handles cannot run ref admin or vacuum") {
    val t = freshTable("br_guard")
    val b = t.createBranch("x")
    intercept[IllegalArgumentException](b.vacuum())
    intercept[IllegalArgumentException](b.vacuumDryRun())
    intercept[IllegalArgumentException](b.createBranch("nested"))
    intercept[IllegalArgumentException](b.createTag("t1"))
    intercept[IllegalArgumentException](b.fastForward("x"))
    intercept[IllegalArgumentException](t.createBranch("x")) // duplicate name
    intercept[IllegalArgumentException](t.fastForward("x")) // nothing to publish
    intercept[IllegalArgumentException](t.branch("nope"))
  }

  test("tagged versions are exempt from vacuum expiry and reclamation") {
    val t = freshTable("tag_vac")
    t.createTag("keepme") // pins v0
    val v0Files = t.manifest().toSet
    t.overwrite((1 to 3).map(i => (i.toLong, s"n$i")).toDF("id", "v")) // v1
    t.overwrite((1 to 4).map(i => (i.toLong, s"m$i")).toDF("id", "v")) // v2
    assert(t.vacuum(retainVersions = 1, retainMillis = 0L) > 0) // v1 reclaimed
    // the tagged v0 survives both log expiry and file reclamation
    assert(t.readTag("keepme").count() === 10)
    assert(v0Files.forall(p => new java.io.File(p).exists()))
    intercept[Exception](t.readVersion(1).collect()) // untagged v1 is gone
    // dropping the tag releases it: the next vacuum reclaims v0
    t.dropTag("keepme")
    assert(t.vacuum(retainVersions = 1, retainMillis = 0L) === v0Files.size)
    intercept[Exception](t.readTag("keepme"))
  }

  test("stale-branch publish fails even when vacuum freed the fork-era slots") {
    val t = freshTable("br_stale")
    val b = t.createBranch("stale") // fork at v0
    b.append(Seq((11L, "v11")).toDF("id", "v"))
    t.overwrite(Seq((1L, "x")).toDF("id", "v")) // v1
    t.overwrite(Seq((2L, "y")).toDF("id", "v")) // v2
    t.vacuum(retainVersions = 1, retainMillis = 0L) // expires slots 0 and 1
    // slot 1 is free again — a bare CAS would "win" below the head
    intercept[SnapshotTable.ConcurrentCommitException](t.fastForward("stale"))
    assert(t.currentVersion() === 2L)
    assert(t.read().as[(Long, String)].collect().toSet === Set((2L, "y")))
  }

  test("vacuum keeps the main log contiguous: tagged slots expire, tag reads survive") {
    val t = freshTable("tag_island")
    t.createTag("pin0") // pins v0
    t.overwrite((1 to 3).map(i => (i.toLong, s"a$i")).toDF("id", "v")) // v1
    t.overwrite((1 to 4).map(i => (i.toLong, s"b$i")).toDF("id", "v")) // v2
    t.overwrite((1 to 5).map(i => (i.toLong, s"c$i")).toDF("id", "v")) // v3
    t.vacuum(retainVersions = 1, retainMillis = 0L)
    // the log holds ONLY the retained tail — no tagged island slot below it
    val logDir = new java.io.File(t.root, "_log")
    val slots = logDir.listFiles().map(_.getName)
      .filter(_.matches("\\d{1,20}\\.json")).sorted.toSeq
    assert(slots === Seq(f"${3L}%020d.json"), slots)
    // tag still resolves — from the entry copy embedded in the ref
    assert(t.tagVersion("pin0") === 0L)
    assert(t.readTag("pin0").count() === 10)
    // ...and so does slot-path resolution for the pinned version
    assert(t.readVersion(0).count() === 10)
    // a stale hint pointing at the tagged version must NOT resolve a
    // false head (the split-brain the island slot would have enabled)
    val hint = new java.io.File(logDir, "_latest_hint")
    java.nio.file.Files.write(hint.toPath, "0".getBytes("UTF-8"))
    assert(t.currentVersion() === 3L)
    // and a commit after the stale hint lands ABOVE the true head
    t.append(Seq((99L, "z")).toDF("id", "v"))
    assert(t.currentVersion() === 4L)
    assert(t.read().count() === 6)
    // restore-to-tag still works with the slot long expired
    t.restore(t.tagVersion("pin0"))
    assert(t.read().count() === 10)
  }

  test("tag and branch names must not collide (shared VERSION AS OF namespace)") {
    val t = freshTable("ref_collide")
    t.createTag("prod")
    val e1 = intercept[IllegalArgumentException](t.createBranch("prod"))
    assert(e1.getMessage.contains("collide"))
    t.createBranch("wip")
    val e2 = intercept[IllegalArgumentException](t.createTag("wip"))
    assert(e2.getMessage.contains("collide"))
  }

  test("all-digit ref names are rejected (VERSION AS OF would shadow them)") {
    val t = freshTable("ref_digits")
    intercept[IllegalArgumentException](t.createTag("2024"))
    intercept[IllegalArgumentException](t.createBranch("7"))
    assert(!t.hasTag("2024") && !t.hasBranch("7"))
  }

  test("racing ref admin: one winner per tag name, branch name, and publish slot") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val t = freshTable("br_race2")
    def race(n: Int)(body: => Unit): Int = {
      val pool = Executors.newFixedThreadPool(n)
      val gate = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      (1 to n).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            try { body; wins.incrementAndGet() } catch { case _: Exception => () }
            ()
          }
        })
      }
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      wins.get()
    }
    // two racing createTag of one name: exactly one wins (write-once file)
    assert(race(2)(t.createTag("only-once")) === 1)
    assert(t.tagVersion("only-once") === 0L)
    // two racing createBranch of one name: exactly one wins (slot CAS)
    assert(race(2)(t.createBranch("contested")) === 1)
    // two racing publishes of one branch: exactly one lands, one commit
    t.branch("contested").append(Seq((11L, "v11")).toDF("id", "v"))
    assert(race(2)(t.fastForward("contested")) === 1)
    assert(t.currentVersion() === 1L)
    assert(t.read().count() === 11)
  }

  test("two forked JVMs: fastForward publishes race main-side vacuum without dangling refs") {
    // the cross-process proof for the WAP publish path: one JVM churns
    // main (overwrite + aggressive vacuum, so log slots genuinely expire
    // mid-race), one JVM loops write-audit-publish cycles. Losers must
    // surface as ConcurrentCommitException (the child retries), winners
    // must be READABLE on main — a publish that won its CAS below the
    // head, or a vacuum that reclaimed published files, fails the child.
    val root = tmpDir("ref_race_fork")
    SnapshotTable.create(spark, root, Seq(("seed", 0)).toDF("writer", "n"))
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // child stderr goes to a file, not DISCARD: when a child exits
    // nonzero the assertion must say WHY — a starved retry loop under
    // full-suite box load (liveness flake, rerun) and a dangling-ref
    // require() (the atomicity bug this race exists to catch) exit
    // identically otherwise
    def spawn(role: String, iters: Int): (Process, java.io.File) = {
      val errF = java.io.File.createTempFile(s"ref_race_$role", ".err")
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1g", "-Dspark.ui.enabled=false",
        "-cp", cp, "graft.tables.RefRaceChild", root, role, iters.toString)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.to(errF))
      (pb.start(), errF)
    }
    def errTail(f: java.io.File): String = {
      val lines = scala.util.Try(
        scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq).getOrElse(Nil)
        .filterNot(l => l.contains("INFO") || l.contains("WARN"))
      // anchor on the LAST exception/require HEADER so the MESSAGE line
      // survives the window — an r11 full-suite flake surfaced a bare
      // mid-stack tail that said nothing about starvation vs real bug.
      // Stack FRAMES are excluded from anchoring: `at …QueryExecution$.
      // withInternalError(…)` contains "Exception" inside the class
      // name, and an r13 flake anchored on the last such frame,
      // producing a headerless tail again
      def isFrame(l: String) = {
        val t = l.trim
        // `Suppressed:` wrappers count as frames too: an r15 full-suite
        // flake anchored on `Suppressed: …OriginalTryStackTraceException`
        // (Spark's try-with-caller-stacktrace bookkeeping), hiding the
        // real exception message that sat just above it
        t.startsWith("at ") || t.startsWith("... ") ||
          t.startsWith("Suppressed:")
      }
      val anchor = lines.lastIndexWhere(l => !isFrame(l) &&
        (l.contains("Exception") || l.contains("Error") ||
          l.contains("starved") || l.contains("requirement failed")))
      val from = if (anchor < 0) math.max(0, lines.size - 15) else anchor
      lines.slice(from, math.min(lines.size, from + 20)).mkString("\n")
    }
    val (churn, churnErr) = spawn("churn", 20)
    val (publish, publishErr) = spawn("publish", 5)
    import java.util.concurrent.TimeUnit
    assert(publish.waitFor(300, TimeUnit.SECONDS), "publisher timed out")
    assert(churn.waitFor(300, TimeUnit.SECONDS), "churner timed out")
    assert(publish.exitValue() === 0,
      s"publisher failed (lost publish or dangling read):\n${errTail(publishErr)}")
    assert(churn.exitValue() === 0, s"churner failed:\n${errTail(churnErr)}")

    // post-race invariants, checked from the parent JVM:
    val t = SnapshotTable(spark, root)
    // (1) the head is readable and every file it references exists
    val head = t.currentVersion()
    assert(head > 0)
    t.read().collect()
    assert(t.manifest().forall(p => new java.io.File(p).exists()),
      "head manifest references a reclaimed file")
    // (2) the retained log is a contiguous tail ending at the head —
    // no island slot a stale hint could resolve as a false head
    val slots = new java.io.File(root, "_log").listFiles().map(_.getName)
      .filter(_.matches("\\d{1,20}\\.json")).map(_.stripSuffix(".json").toLong).sorted.toSeq
    assert(slots.last === head)
    assert(slots === (slots.head to slots.last), s"log has holes: $slots")
    // (3) one final aggressive vacuum leaves the table fully readable
    t.vacuum(retainVersions = 1, retainMillis = 0L)
    t.read().collect()
  }

  test("change feed reports a published branch update as keyed row-level changes") {
    val t = freshTable("br_cdf")
    val b = t.createBranch("audit")
    b.update(org.apache.spark.sql.functions.col("id") === 3L,
      Map("v" -> org.apache.spark.sql.functions.lit("v3x")))
    t.fastForward("audit")
    // the squash commit diffs like any other: one update pre/postimage
    // pair for the touched key, carried CoW rows cancel out
    val feed = t.readChanges(fromVersion = 0, keyCols = Seq("id"))
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed === Set(
      (3L, "v3", "update_preimage", 1L),
      (3L, "v3x", "update_postimage", 1L)), s"unexpected feed: $feed")
  }

  test("branch supports schema evolution and publishes the evolved schema") {
    val t = freshTable("br_schema")
    val b = t.createBranch("evolve")
    b.addColumns(Seq(org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType)))
    b.append(Seq((11L, "v11", 0.5)).toDF("id", "v", "score"))
    assert(!t.schema.fieldNames.contains("score"))
    t.fastForward("evolve")
    assert(t.schema.fieldNames.contains("score"))
    assert(t.read().filter(col("score").isNotNull).count() === 1)
  }
}
