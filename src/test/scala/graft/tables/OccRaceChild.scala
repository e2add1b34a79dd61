package graft.tables

import org.apache.spark.sql.SparkSession

/**
 * Child process for the cross-process OCC race test ([[OccRaceSpec]]):
 * opens the shared table root and performs `commits` overwrites, retrying
 * on [[SnapshotTable.ConcurrentCommitException]] — the behavior a real
 * multi-job writer (the reference's DynamoDB-locked Hudi writers,
 * `hudi/hudi_scd_script.py:41-48`) exhibits against the commit log.
 * Exits 0 only if every commit eventually landed.
 */
object OccRaceChild {
  def main(args: Array[String]): Unit = {
    val (root, writerId, commitsStr, lockMode) = args match {
      case Array(r, w, c) => (r, w, c, "")
      case Array(r, w, c, m) => (r, w, c, m)
    }
    val commits = commitsStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"occ-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val table = SnapshotTable(spark, root)
    // optional 4th arg "lease:<dir>": commit through the lease-based
    // lock-service protocol over a shared lock directory instead of the
    // default hard-link CAS
    if (lockMode.startsWith("lease:")) {
      val svc = new FileLeaseLockService(
        java.nio.file.Paths.get(lockMode.stripPrefix("lease:")))
      table.withCommitLock(new LockServiceCommitLock(svc, "occ-race"))
    }
    (1 to commits).foreach { i =>
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        require(attempts <= 200, s"writer $writerId: commit $i starved")
        try {
          table.overwrite(Seq((writerId, i)).toDF("writer", "n"))
          done = true
        } catch {
          case _: SnapshotTable.ConcurrentCommitException => Thread.sleep(5)
        }
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
