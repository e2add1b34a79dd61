package graft.tables

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.SnapshotTable.{ColStats, FileEntry}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Randomized soundness pin for runtime (DPP) file pruning
 * ([[SnapshotTable.pruneFilesRuntime]]): across seeded scenarios with
 * overlapping ranges, boundless files, null keys, and both regimes (per-key
 * probes and the oversized min/max envelope), every file actually containing
 * one of the probed keys must survive — a wrongly pruned file is a silently
 * lost join row. The envelope regime is additionally pinned as a SUPERSET of
 * the per-key regime (degradation may only keep more).
 */
class RuntimePruneSpec extends AnyFunSuite {

  private val Col = "k"
  private val schema = StructType(Seq(StructField(Col, LongType)))

  test("pruneFilesRuntime never drops a key-holding file (1000 seeded scenarios)") {
    val rnd = new Random(8161206L)
    for (trial <- 1 to 1000) {
      val nFiles = 1 + rnd.nextInt(10)
      final case class F(path: String, values: Seq[Long], boundless: Boolean)
      val fs = (0 until nFiles).map { i =>
        val m = 1 + rnd.nextInt(25)
        val base = rnd.nextInt(90)
        F(s"f$i", Seq.fill(m)((base + rnd.nextInt(40)).toLong),
          boundless = rnd.nextInt(7) == 0)
      }
      val entries = fs.map { f =>
        val stats: Map[String, ColStats] =
          if (f.boundless) Map.empty
          else Map(Col -> ColStats(
            Some(f.values.min.toString), Some(f.values.max.toString), Some(0L)))
        FileEntry(f.path, rows = f.values.size, bytes = 1L, stats = stats)
      }
      val nKeys = 1 + rnd.nextInt(12)
      val keys: Seq[Any] = Seq.fill(nKeys)((rnd.nextInt(140).toLong: Any)) ++
        (if (rnd.nextInt(4) == 0) Seq(null) else Nil)
      val holders = fs.filter(f => f.values.exists(v =>
        keys.contains(v: Any))).map(_.path).toSet

      val sharp = SnapshotTable.pruneFilesRuntime(
        entries, schema, Seq((Col, keys)), None).map(_.path).toSet
      val env = SnapshotTable.pruneFilesRuntime(
        entries, schema, Seq((Col, keys)), None, maxProbedKeys = 1)
        .map(_.path).toSet
      assert((holders -- sharp).isEmpty,
        s"trial $trial: per-key regime dropped holders ${holders -- sharp}")
      assert((holders -- env).isEmpty,
        s"trial $trial: envelope regime dropped holders ${holders -- env}")
      assert((sharp -- env).isEmpty,
        s"trial $trial: envelope must be a superset of per-key, missing ${sharp -- env}")
    }
  }
}
