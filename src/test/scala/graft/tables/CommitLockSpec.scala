package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The lock-service commit protocol ([[LockServiceCommitLock]] over a
 * [[CommitLockService]]) — the object-store-shaped alternative to the
 * default hard-link CAS, mirroring the reference's DynamoDB lock
 * manager (`hudi/hudi_scd_script.py:41-48`).
 */
class CommitLockSpec extends SparkSpec {
  import spark.implicits._

  test("lock service contract: one live lease, expiry steal, stale release no-op") {
    val svc = new InMemoryCommitLockService
    val t1 = svc.tryAcquire("tbl", leaseMillis = 60000)
    assert(t1.isDefined)
    // held by a live owner → not acquirable
    assert(svc.tryAcquire("tbl", 60000).isEmpty)
    // independent names do not contend
    assert(svc.tryAcquire("other", 60000).isDefined)
    svc.release("tbl", t1.get)
    // an EXPIRED lease is stealable; the stolen token fences higher
    val t2 = svc.tryAcquire("tbl", leaseMillis = 1)
    assert(t2.isDefined && t2.get > t1.get)
    Thread.sleep(5)
    val t3 = svc.tryAcquire("tbl", 60000)
    assert(t3.isDefined && t3.get > t2.get)
    // the paused-past-lease holder's release must NOT free the stealer's lease
    svc.release("tbl", t2.get)
    assert(svc.tryAcquire("tbl", 60000).isEmpty)
    svc.release("tbl", t3.get)
    assert(svc.tryAcquire("tbl", 60000).isDefined)
  }

  test("file lease service: atomic create, expiry steal, torn file treated as held") {
    val dir = java.nio.file.Paths.get(tmpDir("filelease"))
    val svc = new FileLeaseLockService(dir)
    val t1 = svc.tryAcquire("tbl", 60000)
    assert(t1.isDefined)
    assert(svc.tryAcquire("tbl", 60000).isEmpty) // live → held
    svc.release("tbl", t1.get)
    assert(!java.nio.file.Files.exists(dir.resolve("tbl.lock")))
    // expired lease: stolen, and the stolen token fences strictly higher
    val t2 = svc.tryAcquire("tbl", leaseMillis = 1)
    Thread.sleep(5)
    val t3 = svc.tryAcquire("tbl", 60000)
    assert(t3.isDefined && t3.get > t2.get)
    // the expired holder's stale release is a no-op for the new lease
    svc.release("tbl", t2.get)
    assert(svc.tryAcquire("tbl", 60000).isEmpty)
    svc.release("tbl", t3.get)
    // a torn/unparseable lock file counts as held, never as stealable
    java.nio.file.Files.write(dir.resolve("torn.lock"), "garbage".getBytes)
    assert(svc.tryAcquire("torn", 60000).isEmpty)
  }

  test("racing writers through the lease lock: every version slot has one winner") {
    val root = tmpDir("lease_race")
    val svc = new InMemoryCommitLockService
    def handle(): SnapshotTable = {
      val h = SnapshotTable(spark, root)
      h.withCommitLock(new LockServiceCommitLock(svc, lockName = "lease_race"))
      h
    }
    val seed = handle()
    seed.overwrite(Seq(("seed", 0)).toDF("writer", "n"))
    // four writers, each retrying the OCC read-compute-commit loop until
    // its append lands — all publishes serialize through ONE named lease
    val writers = 4
    val perWriter = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val futures = (1 to writers).map { w =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          val h = handle()
          var landed = 0
          var attempts = 0
          while (landed < perWriter && attempts < 200) {
            attempts += 1
            try { h.append(Seq((s"w$w", landed)).toDF("writer", "n")); landed += 1 }
            catch { case _: SnapshotTable.ConcurrentCommitException => () }
          }
          landed
        }
      })
    }
    assert(futures.map(_.get()).sum === writers * perWriter)
    pool.shutdown()
    val t = SnapshotTable(spark, root)
    // contiguous log, one parseable entry per slot, all rows present
    assert(t.currentVersion() === writers * perWriter)
    assert(t.history().map(_.version).sorted === (0L to writers.toLong * perWriter))
    assert(t.read().count() === 1 + writers * perWriter)
    (1 to writers).foreach { w =>
      assert(t.read().filter(col("writer") === s"w$w").count() === perWriter)
    }
  }

  test("losing the version race under the lease: appends re-base, overwrites surface") {
    val root = tmpDir("lease_lost")
    val svc = new InMemoryCommitLockService
    val t = SnapshotTable.create(spark, root, Seq((1, "a")).toDF("id", "v"))
    val plain = SnapshotTable(spark, root) // default CAS handle
    val leased = SnapshotTable(spark, root)
    val inner = new LockServiceCommitLock(svc, "lease_lost")
    // deterministic interleaving: just before the leased handle's FIRST
    // publish, a competing writer claims the same slot
    var sabotaged = false
    leased.withCommitLock(new CommitLock {
      override def publish(fs: org.apache.hadoop.fs.FileSystem,
          dest: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
          payload: Array[Byte]): Unit = {
        if (!sabotaged) { sabotaged = true; plain.append(Seq((2, "b")).toDF("id", "v")) }
        inner.publish(fs, dest, tmp, payload)
      }
    })
    // A blind append auto-re-bases onto the sabotage commit. That retry
    // doubles as the lease-release proof: the SECOND publish re-acquires
    // the same lock name, which would dead-time-out had the first (lost)
    // publish kept its lease.
    leased.append(Seq((3, "c")).toDF("id", "v"))
    assert(sabotaged)
    assert(t.currentVersion() === 2) // create, sabotage append, re-based append
    assert(t.read().as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    // An OVERWRITE replaces what the loser read — its lost race still
    // surfaces as the RETRYABLE signal (not IO), and releases the lease
    // for the explicit retry
    sabotaged = false
    intercept[SnapshotTable.ConcurrentCommitException](
      leased.overwrite(Seq((9, "z")).toDF("id", "v")))
    leased.overwrite(Seq((9, "z")).toDF("id", "v"))
    assert(t.read().as[(Int, String)].collect().toSet === Set((9, "z")))
  }

  test("unacquirable lock times out as IO, never as a lost race") {
    val svc = new InMemoryCommitLockService
    val held = svc.tryAcquire("stuck", leaseMillis = 600000)
    assert(held.isDefined)
    val t = SnapshotTable(spark, tmpDir("lease_stuck"))
    t.withCommitLock(new LockServiceCommitLock(svc, "stuck",
      acquireTimeoutMillis = 150))
    // a ConcurrentCommitException here would send callers into a
    // blind-retry loop against a dead lock service
    val e = intercept[java.io.IOException](t.overwrite(Seq((1, "a")).toDF("id", "v")))
    assert(!e.isInstanceOf[SnapshotTable.ConcurrentCommitException])
    assert(e.getMessage.contains("commit lock"))
    svc.release("stuck", held.get)
    t.overwrite(Seq((1, "a")).toDF("id", "v"))
    assert(t.read().count() === 1)
  }
}
