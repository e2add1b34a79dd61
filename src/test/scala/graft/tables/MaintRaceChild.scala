package graft.tables

import org.apache.spark.sql.SparkSession

/**
 * Child process for the cross-process maintenance-vs-ingest race
 * ([[MaintenanceRaceSpec]]): the steady state of the reference's
 * scheduled pipelines — one job appends (ingest), another runs
 * compaction beside it. With the disjoint-file rebase on BOTH sides
 * (appends rebase past compactions, compactions rebase past appends —
 * Delta's conflict-rule pairing), every commit should land without a
 * surfaced conflict; retries are allowed but bounded.
 */
object MaintRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, role, itersStr) = args
    val iters = itersStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"maint-race-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val table = SnapshotTable(spark, root)
    var conflicts = 0
    def retrying(what: String)(op: => Unit): Unit = {
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        require(attempts <= 50, s"$role: $what starved after $attempts attempts")
        try { op; done = true }
        catch {
          case _: SnapshotTable.ConcurrentCommitException =>
            conflicts += 1; Thread.sleep(5)
        }
      }
    }
    role match {
      case "ingest" =>
        (1 to iters).foreach { i =>
          if (i == 6) {
            // overlap is GUARANTEED, not hoped for: don't finish ingest
            // until maintenance has landed at least one compaction, so
            // appends 6.. provably commit after (and race with) it —
            // without this gate a slow-starting maint JVM could see only
            // a finished corpus and the race would go unexercised
            val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
            while (!table.history().exists(_.action == "compact") &&
                System.nanoTime() < deadline)
              Thread.sleep(20)
            require(table.history().exists(_.action == "compact"),
              "no compaction observed mid-ingest; race never overlapped")
          }
          retrying(s"append $i")(
            table.append(Seq((s"a$i", i)).toDF("writer", "n")))
          Thread.sleep(40) // spread the appends across the maint window
        }
      case "maint" =>
        // compact continuously while ingest runs; only compactions that
        // actually rewrote files count (a 1-file table no-ops), so the
        // child cannot "finish" before ingest has produced anything.
        // Once at least one compaction landed AND the table has gone
        // quiet (many consecutive no-ops at an unchanged version),
        // ingest is over and no further productive pass can exist —
        // exit instead of spinning to the deadline
        var productive = 0
        var quiet = 0
        var lastV = -2L
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (productive < iters && quiet < 100 && System.nanoTime() < deadline) {
          var n = 0
          retrying("compact") {
            n = table.compact(targetFileBytes = 1L << 30, smallFileBytes = 1L << 30)
          }
          if (n > 0) { productive += 1; quiet = 0 }
          else {
            val v = table.currentVersion()
            if (productive >= 1 && v == lastV) quiet += 1 else quiet = 0
            lastV = v
            Thread.sleep(20)
          }
        }
        require(productive >= 1,
          s"maintenance never found files to compact")
      case other => sys.error(s"unknown role $other")
    }
    // surfaced conflicts are LEGAL (rebase attempts cap at 5) but should
    // be rare once both sides rebase — the parent asserts completion and
    // content, not zero conflicts
    spark.stop()
    sys.exit(0)
  }
}
