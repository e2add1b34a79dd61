package graft.tables

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Forwarding lock that counts publishes — stands in for a
 *  conditional-put/lock-service impl in the conf-wiring test. */
object CountingCommitLock extends CommitLock {
  val calls = new AtomicInteger(0)
  override def publish(fs: FileSystem, dest: Path, tmpDir: Path,
      payload: Array[Byte]): Unit = {
    calls.incrementAndGet()
    FileSystemCommitLock.publish(fs, dest, tmpDir, payload)
  }
}

/** Same shape as a user-supplied no-arg CLASS implementation. */
class CountingCommitLockClass extends CommitLock {
  override def publish(fs: FileSystem, dest: Path, tmpDir: Path,
      payload: Array[Byte]): Unit = {
    CountingCommitLock.calls.incrementAndGet()
    FileSystemCommitLock.publish(fs, dest, tmpDir, payload)
  }
}

/**
 * `spark.graft.commitLock` — the session-wide CommitLock seam for
 * object-store deployments (the reference wires its DynamoDB lock
 * manager through spark confs the same way): every table resolved
 * WITHOUT a handle in hand (DSv2 catalog, SQL commands, the catalog
 * registry) must still commit through the configured lock.
 */
class CommitLockConfSpec extends SparkSpec {
  import spark.implicits._

  private def withLockConf[A](cls: String)(f: => A): A = {
    spark.conf.set("spark.graft.commitLock", cls)
    try f finally spark.conf.unset("spark.graft.commitLock")
  }

  test("table commits route through the configured lock (object and class forms)") {
    for (cls <- Seq("graft.tables.CountingCommitLock",
        "graft.tables.CountingCommitLockClass")) {
      withLockConf(cls) {
        val before = CountingCommitLock.calls.get()
        val t = SnapshotTable.create(spark, tmpDir("lockconf"),
          Seq((1, "a")).toDF("id", "v"))
        t.append(Seq((2, "b")).toDF("id", "v"))
        assert(CountingCommitLock.calls.get() >= before + 2,
          s"$cls: commits bypassed the configured lock")
        assert(t.read().count() === 2)
      }
    }
  }

  test("catalog registry CAS rides the same configured lock") {
    withLockConf("graft.tables.CountingCommitLock") {
      val before = CountingCommitLock.calls.get()
      val wh = tmpDir("lockconf_wh")
      graft.sql.CatalogRegistry.register(spark, wh, Seq("db", "t"), "/some/root")
      assert(CountingCommitLock.calls.get() >= before + 1)
      assert(graft.sql.CatalogRegistry.lookup(spark, wh, Seq("db", "t"))
        === Some("/some/root"))
    }
  }

  test("a misconfigured lock class fails loudly at table construction") {
    withLockConf("no.such.LockClass") {
      val e = intercept[IllegalArgumentException] {
        SnapshotTable(spark, tmpDir("lockconf_bad"))
      }
      assert(e.getMessage.contains("spark.graft.commitLock"))
    }
  }
}
