package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * CROSS-PROCESS optimistic concurrency: two forked JVMs race overwrites
 * against one table root through the hard-link CAS commit protocol
 * (`SnapshotTable.writeCommit`). The in-JVM thread race in
 * [[SnapshotTableSpec]] cannot exercise `link(2)`'s cross-process
 * atomicity — this is the local stand-in for the reference's DynamoDB
 * optimistic lock across EMR jobs (`hudi/hudi_scd_script.py:41-48`).
 */
class OccRaceSpec extends SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def raceTwoWriters(root: String, commitsPerWriter: Int,
      extraArgs: Seq[String]): Unit = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    def spawn(id: String): Process = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1g", "-Dspark.ui.enabled=false",
        "-cp", cp, "graft.tables.OccRaceChild",
        root, id, commitsPerWriter.toString) ++ extraArgs).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      pb.start()
    }
    val p1 = spawn("w1")
    val p2 = spawn("w2")
    import java.util.concurrent.TimeUnit
    assert(p1.waitFor(300, TimeUnit.SECONDS), "writer 1 timed out")
    assert(p2.waitFor(300, TimeUnit.SECONDS), "writer 2 timed out")
    assert(p1.exitValue() === 0, "writer 1 failed")
    assert(p2.exitValue() === 0, "writer 2 failed")
  }

  test("two forked JVMs: every version has exactly one winner; losers vacuum away") {
    val root = tmpDir("occ_fork")
    val t = SnapshotTable.create(spark, root, Seq(("seed", 0)).toDF("writer", "n"))
    val commitsPerWriter = 4
    raceTwoWriters(root, commitsPerWriter, Nil)

    // every writer landed every commit exactly once → the log is a
    // contiguous 0..2n range with one parseable entry per slot
    assert(t.currentVersion() === 2L * commitsPerWriter)
    val history = t.history()
    assert(history.size === 2 * commitsPerWriter + 1)
    assert(history.map(_.version).sorted === (0L to 2L * commitsPerWriter))

    // each writer's final overwrite content is intact somewhere in history
    val finals = (0L to 2L * commitsPerWriter).map(v =>
      t.readVersion(v).as[(String, Int)].head()).toSet
    assert(finals.contains(("w1", commitsPerWriter)))
    assert(finals.contains(("w2", commitsPerWriter)))

    // losers' pre-written data dirs are orphans → vacuum reclaims them,
    // and the surviving snapshot still reads
    val latest = t.read().as[(String, Int)].head()
    assert(t.vacuum(retainVersions = 1, retainMillis = 0) >= 1)
    assert(t.read().as[(String, Int)].head() === latest)
  }

  test("two forked JVMs coordinating through the file-lease lock service") {
    // same race, but commits serialize through LockServiceCommitLock +
    // FileLeaseLockService over a shared lock dir — the cross-process
    // proof for the object-store-shaped protocol (the DynamoDB role)
    val root = tmpDir("occ_lease")
    val lockDir = tmpDir("occ_lease_locks")
    val t = SnapshotTable.create(spark, root, Seq(("seed", 0)).toDF("writer", "n"))
    val commitsPerWriter = 4
    raceTwoWriters(root, commitsPerWriter, Seq(s"lease:$lockDir"))
    assert(t.currentVersion() === 2L * commitsPerWriter)
    val history = t.history()
    assert(history.size === 2 * commitsPerWriter + 1)
    assert(history.map(_.version).sorted === (0L to 2L * commitsPerWriter))
    val finals = (0L to 2L * commitsPerWriter).map(v =>
      t.readVersion(v).as[(String, Int)].head()).toSet
    assert(finals.contains(("w1", commitsPerWriter)))
    assert(finals.contains(("w2", commitsPerWriter)))
    // all leases released: the lock dir holds no live lock files
    val leftover = new java.io.File(lockDir).listFiles()
      .filter(_.getName.endsWith(".lock"))
    assert(leftover.isEmpty, s"unreleased leases: ${leftover.mkString(",")}")
  }
}
