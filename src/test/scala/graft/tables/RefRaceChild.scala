package graft.tables

import org.apache.spark.sql.SparkSession

/**
 * Child process for the cross-process fastForward-vs-vacuum race
 * ([[TagBranchSpec]]): two roles against one shared table root.
 *
 *  - `churn`: overwrites main and vacuums with retainVersions=1 and a
 *    SHORT slot/file retention, so log slots genuinely expire while the
 *    other process is publishing — the adversarial schedule for the
 *    head-probe + commit-CAS in [[SnapshotTable.fastForward]].
 *  - `publish`: loops write-audit-publish cycles (fork branch, append a
 *    marker row, fastForward); a lost CAS re-forks and replays, and every
 *    win is verified by reading the marker back from MAIN — a dangling
 *    file reference or lost publish fails the read and exits nonzero.
 *
 * Exits 0 only if every iteration behaved: publishes either land
 * verifiably or lose with ConcurrentCommitException, never anything else.
 */
object RefRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, role, itersStr) = args
    val iters = itersStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"ref-race-$role")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val table = SnapshotTable(spark, root)
    role match {
      case "churn" =>
        (1 to iters).foreach { i =>
          var done = false
          while (!done) {
            try { table.overwrite(Seq(("churn", i)).toDF("writer", "n")); done = true }
            catch { case _: SnapshotTable.ConcurrentCommitException => Thread.sleep(3) }
          }
          // retainMillis guards BOTH data files and log slots for
          // in-flight writers; 1500 ms is far above any probe→CAS window
          // and far below the test's runtime, so expiry really happens
          table.vacuum(retainVersions = 1, retainMillis = 1500L)
        }
      case "publish" =>
        // a publisher stalled past churn's 1500 ms retention loses its
        // fork's files — the documented retention trade (retention must
        // exceed the slowest writer's pause); that loss surfaces as a
        // FileNotFound somewhere in the exception chain and is a
        // RETRYABLE outcome here, not a correctness failure
        def fileGone(e: Throwable): Boolean = {
          var t: Throwable = e
          while (t != null) {
            if (t.isInstanceOf[java.io.FileNotFoundException] ||
              (t.getMessage != null && t.getMessage.contains("does not exist")))
              return true
            t = t.getCause
          }
          false
        }
        var wins = 0
        var attempts = 0
        while (wins < iters) {
          attempts += 1
          require(attempts <= 400, s"publisher starved after $attempts attempts")
          // PHASE 1 — fork/append/fastForward: losing a race here is the
          // retention trade, so FileNotFound and lost-CAS retry.
          var published = false
          try {
            if (table.hasBranch("wap")) table.dropBranch("wap")
            val b = table.createBranch("wap")
            b.append(Seq((s"pub$wins", wins)).toDF("writer", "n"))
            table.fastForward("wap")
            published = true
          } catch {
            case _: SnapshotTable.ConcurrentCommitException => Thread.sleep(3)
            case e: IllegalStateException
                if e.getMessage != null && e.getMessage.contains("no readable head") =>
              Thread.sleep(3) // forked log entry raced vacuum's hint rewrite
            case e: Exception if fileGone(e) =>
              Thread.sleep(3) // paused past the retention window; re-fork
          }
          // PHASE 2 — verification: the publish committed, so a failure
          // here is never silently retried as a re-fork. Two distinct
          // failure shapes must be told apart:
          //  - the read raced a SUPERSEDING overwrite + vacuum (head
          //    moved past our publish and reclaimed its files mid-read):
          //    the documented stale-reader retention trade — legitimate,
          //    but only if the log proves the supersession AND the fresh
          //    head itself reads cleanly;
          //  - anything else — marker lost without a superseding commit,
          //    or an UNREADABLE head — is the dangling-reference
          //    atomicity bug this race exists to catch, and fails.
          if (published) {
            def requireSuperseded(): Unit = {
              val hist = table.history()
              require(hist.headOption.exists(_.action == "overwrite"),
                s"publish $wins vanished but the head commit is not a " +
                  s"superseding overwrite: ${hist.take(3)}")
            }
            try {
              val seen = table.read().as[(String, Int)].collect().toSet
              if (!seen.contains((s"pub$wins", wins))) requireSuperseded()
            } catch {
              case e: Exception if fileGone(e) =>
                requireSuperseded()
                // the fresh head must read; further supersession races
                // get a bounded number of re-checks, then it's a bug
                var ok = false
                var tries = 0
                while (!ok && tries < 5) {
                  tries += 1
                  try { table.read().as[(String, Int)].collect(); ok = true }
                  catch {
                    case e2: Exception if fileGone(e2) =>
                      requireSuperseded(); Thread.sleep(10)
                  }
                }
                require(ok, "head unreadable after 5 post-publish attempts " +
                  "— dangling file reference at the head")
            }
            wins += 1
          }
        }
      case other => sys.error(s"unknown role $other")
    }
    spark.stop()
    sys.exit(0)
  }
}
