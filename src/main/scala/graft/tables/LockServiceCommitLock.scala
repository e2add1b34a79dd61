package graft.tables

import java.io.{IOException, InterruptedIOException}

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * External-lock-service lease, the second [[CommitLock]] primitive the
 * seam exists for: the shape of commit coordination on plain object
 * stores, where [[FileSystemCommitLock]]'s hard-link / EEXCL-create
 * atomicity does not exist. This is the role the reference delegates to
 * its DynamoDB lock manager (`hudi/hudi_scd_script.py:41-48` sets
 * `hoodie.write.lock.provider=DynamoDBBasedLockProvider`;
 * `iceberg/iceberg_submit.sh:33-34` the Glue/DynamoDB lock table): all
 * writers of a table serialize their publish through one named lock
 * with a lease, and under the lock a plain existence check + staged
 * rename is enough — mutual exclusion replaces the per-slot CAS.
 *
 * Lease caveat (shared with every lease-based lock manager, DynamoDB's
 * included): a holder paused past its lease (GC, network partition) can
 * wake and publish AFTER a stealer acquired the lock. The fencing
 * `token` exposes the ordering, but plain filesystems offer no
 * conditional-put to enforce it at the store — deployments needing
 * strictness under multi-lease pauses must back [[CommitLockService]]
 * with a store that validates the token on write (S3 `If-None-Match`,
 * GCS `ifGenerationMatch`, DynamoDB conditional expressions). The
 * lease length is therefore a real tuning knob: it must exceed the
 * worst-case publish (one small JSON write), which is why the default
 * is generous.
 */
final class LockServiceCommitLock(
    service: CommitLockService,
    lockName: String,
    leaseMillis: Long = 60000L,
    acquireTimeoutMillis: Long = 120000L) extends CommitLock {

  override def publish(
      fs: FileSystem, dest: Path, tmpDir: Path, payload: Array[Byte]): Unit = {
    val deadline = System.currentTimeMillis() + acquireTimeoutMillis
    var token = service.tryAcquire(lockName, leaseMillis)
    var backoff = 5L
    while (token.isEmpty) {
      if (System.currentTimeMillis() > deadline)
        throw new IOException(
          s"could not acquire commit lock '$lockName' within ${acquireTimeoutMillis}ms " +
            "(held by a live writer, or its service is unreachable) — NOT a lost " +
            "version race; surfacing as IO so callers do not blind-retry")
      try Thread.sleep(backoff)
      catch { case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new InterruptedIOException(s"interrupted acquiring '$lockName'")
      }
      backoff = math.min(backoff * 2, 200L)
      token = service.tryAcquire(lockName, leaseMillis)
    }
    try {
      // single writer under the lease: the slot-taken check is a plain
      // read (no store-level atomicity needed), losers surface the
      // retryable lost-race signal exactly like the CAS impl
      if (fs.exists(dest))
        throw new SnapshotTable.ConcurrentCommitException(
          s"commit slot $dest was claimed by an earlier lease holder")
      val tmp = new Path(tmpDir,
        s"commit-${java.util.UUID.randomUUID().toString.take(12)}.json")
      val out = fs.create(tmp, false)
      try out.write(payload) finally out.close()
      // rename publishes atomically on HDFS/local; under the lease there
      // is no competing renamer (modulo the documented pause-past-lease)
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false)
        if (fs.exists(dest))
          throw new SnapshotTable.ConcurrentCommitException(
            s"commit slot $dest appeared during publish (lease was stolen?)")
        throw new IOException(s"rename $tmp -> $dest failed")
      }
    } finally service.release(lockName, token.get)
  }
}

/**
 * The lock service a [[LockServiceCommitLock]] coordinates through —
 * the five-line surface a DynamoDB/ZooKeeper/Redis-backed
 * implementation fills in. Contract: at most one live (unexpired,
 * unreleased) lease per name at a time; `tryAcquire` on a held name
 * returns None; an EXPIRED lease is stealable. Tokens are opaque
 * fencing values, strictly increasing per name.
 */
trait CommitLockService {

  /** Acquire `name` for `leaseMillis`, returning the fencing token —
   *  None when held by a live owner. */
  def tryAcquire(name: String, leaseMillis: Long): Option[Long]

  /** Release `name` if `token` still holds it; releasing an expired or
   *  stolen lease is a harmless no-op. */
  def release(name: String, token: Long): Unit
}

/**
 * Filesystem-backed [[CommitLockService]] for CROSS-PROCESS writers
 * sharing a local/NFS/HDFS-style path: the lease for `name` is a lock
 * file created atomically (`CREATE_NEW`), holding `token:deadline`.
 * An expired lease is stolen by renaming the stale file aside — rename
 * succeeds for exactly one stealer — then re-creating; the stolen
 * token seeds the next one, keeping tokens increasing per name.
 *
 * Best-effort caveats (vs the synchronized in-memory impl): `release`
 * is read-check-delete, so a holder releasing AFTER its lease expired
 * can in a narrow window delete a stealer's fresh lease — correct
 * usage releases well before expiry (size the lease to the publish,
 * see [[LockServiceCommitLock]]); and like every lease lock here, the
 * store does not validate fencing tokens on write. Same class of
 * guarantees as lock-file coordination in mainstream schedulers; for
 * strictness under arbitrary pauses use a conditional-put store.
 */
final class FileLeaseLockService(dir: java.nio.file.Path) extends CommitLockService {
  java.nio.file.Files.createDirectories(dir)
  private def lockPath(name: String) = dir.resolve(s"$name.lock")

  override def tryAcquire(name: String, leaseMillis: Long): Option[Long] = {
    val path = lockPath(name)
    val now = System.currentTimeMillis()
    def create(token: Long): Option[Long] =
      try {
        java.nio.file.Files.write(path, s"$token:${now + leaseMillis}".getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        Some(token)
      } catch { case _: java.nio.file.FileAlreadyExistsException => None }
    create(now).orElse {
      // held or stale: a torn/unparseable file counts as held until its
      // writer finishes or a later acquire sees it expired-by-content
      val parsed =
        try {
          val Array(t, d) = new String(
            java.nio.file.Files.readAllBytes(path), "UTF-8").split(":")
          Some((t.toLong, d.toLong))
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed match {
        case Some((staleToken, deadline)) if deadline <= now =>
          // steal: exactly one renamer wins the stale file
          val trash = dir.resolve(s".stale-$name-${java.util.UUID.randomUUID()}")
          try {
            java.nio.file.Files.move(path, trash)
            java.nio.file.Files.deleteIfExists(trash)
            create(math.max(staleToken + 1, now))
          } catch { case _: java.io.IOException => None } // lost the steal
        case _ => None
      }
    }
  }

  override def release(name: String, token: Long): Unit = {
    val path = lockPath(name)
    try {
      val Array(t, _) = new String(
        java.nio.file.Files.readAllBytes(path), "UTF-8").split(":")
      if (t.toLong == token) java.nio.file.Files.deleteIfExists(path)
    } catch { case scala.util.control.NonFatal(_) => () } // already gone/stolen
  }
}

/** In-process [[CommitLockService]]: the contract reference used by the
 *  seam's tests, and sufficient for many-threads-one-JVM writers (e.g.
 *  concurrent streaming queries in one driver). Cross-process
 *  deployments need an external store behind the same trait. */
final class InMemoryCommitLockService extends CommitLockService {
  private case class Lease(token: Long, deadlineMillis: Long)
  private val leases = scala.collection.mutable.HashMap[String, Lease]()
  private var nextToken = 0L

  override def tryAcquire(name: String, leaseMillis: Long): Option[Long] =
    synchronized {
      val now = System.currentTimeMillis()
      leases.get(name) match {
        case Some(l) if l.deadlineMillis > now => None
        case _ =>
          nextToken += 1
          leases(name) = Lease(nextToken, now + leaseMillis)
          Some(nextToken)
      }
    }

  override def release(name: String, token: Long): Unit = synchronized {
    leases.get(name) match {
      case Some(l) if l.token == token => leases.remove(name)
      case _ => () // expired and stolen, or never held: no-op
    }
  }
}
