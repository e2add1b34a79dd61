package graft.sql

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.SnapshotTable.{ColStats, FileEntry}

/**
 * Randomized soundness pin for the TopN θ rule ([[GraftScanBuilder.topNCap]]):
 * across seeded scenarios with overlapping file ranges, duplicate values,
 * null-bearing files (which order FIRST under the default ascending sort and
 * are invisible to min/max stats), boundless files, and deletion vectors of
 * adversarially-unknown position (the rule sees only COUNTS — the model
 * deletes concrete rows and checks against the survivors), the kept file set
 * must contain EVERY file that could contribute a row to the true top n
 * under any tie-break. Missing one file = a silently missing result row.
 */
class TopNCapSpec extends AnyFunSuite {

  private val Col = "k"

  test("topNCap keeps every possible top-n contributor (1000 seeded scenarios, asc+desc)") {
    val rnd = new Random(20260816L)
    for (trial <- 1 to 1000) {
      val nFiles = 1 + rnd.nextInt(10)
      // per-file: live values (post-deletion), deleted count, null count,
      // and whether the file reports stats at all
      final case class F(path: String, values: Seq[Long], deleted: Seq[Long],
          nulls: Int, boundless: Boolean)
      val fs = (0 until nFiles).map { i =>
        val m = 1 + rnd.nextInt(20)
        val base = rnd.nextInt(80)
        val all = Seq.fill(m)((base + rnd.nextInt(50)).toLong)
        val delCount = if (rnd.nextInt(3) == 0) rnd.nextInt(m) else 0
        // deletions are position-blind to the rule; the model deletes a
        // RANDOM subset (including, sometimes, exactly the extremes)
        val shuffled = rnd.shuffle(all)
        val (deleted, live) = shuffled.splitAt(delCount)
        F(s"f$i", live, deleted,
          nulls = if (rnd.nextInt(5) == 0) 1 + rnd.nextInt(3) else 0,
          boundless = rnd.nextInt(8) == 0)
      }
      val entries = fs.map { f =>
        val all = f.values ++ f.deleted // stats predate deletions
        val stats: Map[String, ColStats] =
          if (f.boundless || all.isEmpty) Map.empty
          else Map(Col -> ColStats(
            Some(all.min.toString), Some(all.max.toString), Some(f.nulls.toLong)))
        FileEntry(f.path, rows = all.size + f.nulls, bytes = 1L, stats = stats)
      }
      val dvDel: Map[String, Long] =
        fs.map(f => f.path -> f.deleted.size.toLong).toMap
      val n = 1 + rnd.nextInt(25)

      for (asc <- Seq(true, false)) {
        val kept = GraftScanBuilder.topNCap(entries, dvDel, Col, asc, n)
          .map(_.path).toSet
        // the true top-n contributors, under ANY tie-break: with k =
        // non-null slots left after nulls (asc; nulls sort last desc so
        // they never displace values there), T = the k-th live value in
        // sort order — holders are null-bearing files (asc), every file
        // with a live value strictly inside T, and every file TIED at T
        val liveAll = fs.flatMap(f => f.values.map(v => (f.path, v)))
        val totalNulls = fs.map(_.nulls).sum
        val k = if (asc) math.max(0, n - totalNulls) else n
        val ordered =
          if (asc) liveAll.sortBy(_._2) else liveAll.sortBy(v => -v._2)
        val holders: Set[String] =
          if (ordered.size <= k) fs.filter(f => f.values.nonEmpty || f.nulls > 0)
            .map(_.path).toSet
          else if (k == 0) fs.filter(_.nulls > 0).map(_.path).toSet
          else {
            val t = ordered(k - 1)._2
            val inside = liveAll.filter { case (_, v) =>
              if (asc) v <= t else v >= t }.map(_._1).toSet
            inside ++ (if (asc) fs.filter(_.nulls > 0).map(_.path) else Nil)
          }
        val missing = holders -- kept
        assert(missing.isEmpty,
          s"trial $trial asc=$asc n=$n: θ rule dropped top-n holders $missing\n" +
            fs.map(f => s"${f.path}: live=${f.values.sorted} deleted=${f.deleted.size} " +
              s"nulls=${f.nulls} boundless=${f.boundless}").mkString("\n"))
      }
    }
  }

  test("topNCap over STRING keys: exact-flagged bounds prune, unflagged never (500 scenarios)") {
    // the string domain adds one refusal class the long test can't model:
    // a file whose bounds are NOT writer-exact (adopted/pre-flag — the
    // values may be truncated) must behave exactly like a boundless file:
    // always kept, contributing nothing toward θ. Values map longs →
    // zero-padded strings so lexicographic (UTF8String binary) order
    // equals the numeric order the holder model computes in.
    val rnd = new Random(20260813L)
    import org.apache.spark.sql.types.StringType
    def str(v: Long): String = f"s$v%04d"
    for (trial <- 1 to 500) {
      val nFiles = 1 + rnd.nextInt(10)
      final case class F(path: String, values: Seq[Long], deleted: Seq[Long],
          nulls: Int, boundless: Boolean, exact: Boolean)
      val fs = (0 until nFiles).map { i =>
        val m = 1 + rnd.nextInt(20)
        val base = rnd.nextInt(80)
        val all = Seq.fill(m)((base + rnd.nextInt(50)).toLong)
        val delCount = if (rnd.nextInt(3) == 0) rnd.nextInt(m) else 0
        val shuffled = rnd.shuffle(all)
        val (deleted, live) = shuffled.splitAt(delCount)
        F(s"f$i", live, deleted,
          nulls = if (rnd.nextInt(5) == 0) 1 + rnd.nextInt(3) else 0,
          boundless = rnd.nextInt(8) == 0,
          exact = rnd.nextInt(4) != 0) // 1 in 4 files: adopted bounds
      }
      val entries = fs.map { f =>
        val all = f.values ++ f.deleted
        val stats: Map[String, ColStats] =
          if (f.boundless || all.isEmpty) Map.empty
          else Map(Col -> ColStats(
            Some(str(all.min)), Some(str(all.max)), Some(f.nulls.toLong),
            exact = if (f.exact) Some(true) else None))
        FileEntry(f.path, rows = all.size + f.nulls, bytes = 1L, stats = stats)
      }
      val dvDel: Map[String, Long] =
        fs.map(f => f.path -> f.deleted.size.toLong).toMap
      val n = 1 + rnd.nextInt(25)
      for (asc <- Seq(true, false)) {
        val kept = GraftScanBuilder.topNCap(entries, dvDel, Col, asc, n, StringType)
          .map(_.path).toSet
        // unflagged files must ALWAYS be kept — their bounds are not
        // trustworthy in either direction
        val unflagged = fs.filter(f => !f.exact && !f.boundless &&
          (f.values ++ f.deleted).nonEmpty).map(_.path).toSet
        assert((unflagged -- kept).isEmpty,
          s"trial $trial asc=$asc: unflagged string-bounds file pruned: ${unflagged -- kept}")
        val liveAll = fs.flatMap(f => f.values.map(v => (f.path, v)))
        val totalNulls = fs.map(_.nulls).sum
        val k = if (asc) math.max(0, n - totalNulls) else n
        val ordered =
          if (asc) liveAll.sortBy(_._2) else liveAll.sortBy(v => -v._2)
        val holders: Set[String] =
          if (ordered.size <= k) fs.filter(f => f.values.nonEmpty || f.nulls > 0)
            .map(_.path).toSet
          else if (k == 0) fs.filter(_.nulls > 0).map(_.path).toSet
          else {
            val t = ordered(k - 1)._2
            val inside = liveAll.filter { case (_, v) =>
              if (asc) v <= t else v >= t }.map(_._1).toSet
            inside ++ (if (asc) fs.filter(_.nulls > 0).map(_.path) else Nil)
          }
        val missing = holders -- kept
        assert(missing.isEmpty,
          s"trial $trial asc=$asc n=$n: string θ rule dropped holders $missing\n" +
            fs.map(f => s"${f.path}: live=${f.values.sorted} exact=${f.exact} " +
              s"nulls=${f.nulls} boundless=${f.boundless}").mkString("\n"))
      }
    }
  }
}
