package graft.scd2

import java.security.MessageDigest
import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.SnapshotTable

/**
 * Property-style SCD2 invariants (SURVEY.md §5.2) under seeded random
 * update streams, for all three reference algorithms:
 *  - per id, exactly one `iscurrent = 1` row;
 *  - the current row's checksum matches the latest payload;
 *  - expired rows have non-null `valid_to` and intervals chain without
 *    gaps (each expired row's valid_to equals the successor's valid_from).
 */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def ts(batch: Int) = Timestamp.valueOf(f"2024-${batch + 1}%02d-01 00:00:00")

  private def runStream(algo: String, seed: Int): Unit = {
    val rnd = new Random(seed)
    val payloads = scala.collection.mutable.Map[Int, (String, String, String)]()
    (1 to 30).foreach(i => payloads(i) = (s"name$i", s"e$i@x.com", "CA"))

    def df(m: Map[Int, (String, String, String)]) =
      m.toSeq.sortBy(_._1)
        .map { case (id, (n, e, st)) => (id, n, e, st) }
        .toDF("id", "name", "email", "state")

    val table = Scd2.initialLoad(spark, tmpDir("prop"),
      df(payloads.toMap), ts(0), withTs = algo != "delta")

    var nextId = 31
    (1 to 3).foreach { batch =>
      // mutate ~30% of ids, add 3 new ids; staged batch = full snapshot
      payloads.keys.toSeq.sorted.foreach { id =>
        if (rnd.nextDouble() < 0.3) {
          val (n, _, st) = payloads(id)
          payloads(id) = (n, s"changed$batch-$id@x.com", st)
        }
      }
      (1 to 3).foreach { _ =>
        payloads(nextId) = (s"name$nextId", s"e$nextId@x.com", "NY")
        nextId += 1
      }
      val staged = df(payloads.toMap)
      algo match {
        case "hudi" => Scd2.hudiStyleMerge(table, staged, ts(batch))
        case "iceberg" => Scd2.icebergStyleMerge(table, staged, ts(batch))
        case "delta" => Scd2.deltaStyleMerge(table, staged, ts(batch))
      }

      val rows = table.read()
        .select("id", "checksum", "iscurrent", "valid_from", "valid_to")
        .as[(Int, String, Int, Timestamp, Option[Timestamp])]
        .collect()

      // (1) exactly one current row per id
      val byId = rows.groupBy(_._1)
      byId.foreach { case (id, rs) =>
        assert(rs.count(_._3 == 1) === 1,
          s"[$algo seed=$seed batch=$batch] id=$id current rows != 1")
      }
      // (2) current checksum matches the latest payload
      byId.foreach { case (id, rs) =>
        val (n, e, st) = payloads(id)
        val cur = rs.find(_._3 == 1).get
        assert(cur._2 === md5hex(n + e + st),
          s"[$algo seed=$seed batch=$batch] id=$id current checksum stale")
      }
      // (3) expired rows closed; intervals never overlap. Exact gap-free
      // chaining holds only for the delta variant: hudi/iceberg merges
      // refresh valid_from of unchanged matched rows on every load (the
      // reference's UPDATE SET * quirk, SURVEY §3.3), which can advance a
      // current row's valid_from past its predecessor's valid_to.
      byId.foreach { case (id, rs) =>
        val sorted = rs.sortBy(_._4.getTime)
        sorted.dropRight(1).zip(sorted.drop(1)).foreach { case (prev, next) =>
          if (algo == "delta")
            assert(prev._5.contains(next._4),
              s"[$algo seed=$seed batch=$batch] id=$id interval gap: ${prev._5} -> ${next._4}")
          else
            assert(prev._5.exists(!_.after(next._4)),
              s"[$algo seed=$seed batch=$batch] id=$id interval overlap: ${prev._5} -> ${next._4}")
        }
        assert(sorted.last._5.isEmpty,
          s"[$algo seed=$seed batch=$batch] id=$id last row must be open-ended")
        assert(sorted.dropRight(1).forall(_._5.nonEmpty),
          s"[$algo seed=$seed batch=$batch] id=$id non-last row missing valid_to")
      }
    }

    // idempotence: re-merging the identical staged batch adds no rows
    val before = table.read().count()
    val staged = df(payloads.toMap)
    algo match {
      case "hudi" => Scd2.hudiStyleMerge(table, staged, ts(5))
      case "iceberg" => Scd2.icebergStyleMerge(table, staged, ts(5))
      case "delta" => Scd2.deltaStyleMerge(table, staged, ts(5))
    }
    assert(table.read().count() === before,
      s"[$algo seed=$seed] re-merge of identical batch changed row count")
  }

  for (algo <- Seq("hudi", "iceberg", "delta"); seed <- Seq(7, 42))
    test(s"SCD2 invariants hold under random update stream ($algo, seed=$seed)") {
      runStream(algo, seed)
    }
}
