package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.SnapshotTable

/**
 * Model-based randomized checks: the table operators vs a plain Scala
 * map/set simulation, over seeded-random inputs — the semantics
 * contract (Hudi upsert, Delta MERGE, MoR replay) checked against an
 * implementation that cannot share bugs with the engine.
 */
class MergeModelSpec extends SparkSpec {
  import spark.implicits._

  private def randomBatch(rnd: Random, keySpace: Int, n: Int): Seq[(Long, String, Long)] =
    Seq.fill(n)((rnd.nextInt(keySpace).toLong, "v" + rnd.nextInt(1000), rnd.nextInt(100).toLong))

  test("upsert == precombine-latest map override (seeded random, 5 batches)") {
    val rnd = new Random(42)
    val base = randomBatch(rnd, 50, 40).groupBy(_._1).map(_._2.head).toSeq
    val t = SnapshotTable.create(spark, tmpDir("model"), base.toDF("id", "v", "ts"))
    var model: Map[Long, (Long, String, Long)] = base.map(r => r._1 -> r).toMap
    (1 to 5).foreach { _ =>
      // globally unique ts values: precombine ordering is total, so the
      // engine and the model cannot disagree on tie-breaks
      val batch = randomBatch(rnd, 50, 15).zipWithIndex
        .map { case ((k, v, ts), i) => (k, v, ts * 100 + i) }
      t.upsert(batch.toDF("id", "v", "ts"), keys = Seq("id"), precombine = "ts")
      batch.groupBy(_._1).foreach { case (k, rows) => model += k -> rows.maxBy(_._3) }
      val got = t.read().as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      assert(got === model)
    }
  }

  test("MoR deferred replay == eager upserts, before and after compaction") {
    val rnd = new Random(7)
    val base = randomBatch(rnd, 60, 50).groupBy(_._1).map(_._2.head).toSeq
      .toDF("id", "v", "ts")
    val eager = SnapshotTable.create(spark, tmpDir("eager"), base)
    val mor = SnapshotTable.create(spark, tmpDir("mor"), base)
    val batches = (1 to 6).map { i =>
      // strictly rising ts per batch removes cross-batch precombine ties:
      // both paths must then agree exactly
      randomBatch(rnd, 60, 12).groupBy(_._1).map(_._2.head).toSeq
        .map { case (k, v, _) => (k, v + s"_b$i", i.toLong) }
    }
    batches.foreach { b =>
      eager.upsert(b.toDF("id", "v", "ts"), Seq("id"), "ts")
      mor.upsertDeferred(b.toDF("id", "v", "ts"), Seq("id"), "ts")
    }
    def snap(t: SnapshotTable) =
      t.read().as[(Long, String, Long)].collect().toSet
    assert(snap(mor) === snap(eager), "RT view diverged from eager replay")
    mor.applyDeltas()
    assert(snap(mor) === snap(eager), "compacted view diverged from eager replay")
    assert(mor.deltaManifest().isEmpty)
  }

  test("MoR interleaved upserts+deletes == map/set model, pre and post compaction") {
    // randomized interleaving of deferred upsert batches and deferred
    // delete batches vs a plain Scala map simulation: the tombstone
    // path's replay semantics (delete wins over earlier batches, later
    // upsert resurrects) checked against an implementation that cannot
    // share bugs with the engine
    val rnd = new Random(13)
    val base = randomBatch(rnd, 40, 35).groupBy(_._1).map(_._2.head).toSeq
    val t = SnapshotTable.create(spark, tmpDir("mor_model"), base.toDF("id", "v", "ts"))
    var model: Map[Long, (Long, String, Long)] = base.map(r => r._1 -> r).toMap
    (1 to 8).foreach { i =>
      if (i % 3 == 0) {
        // delete batch: a random residue class — predicate-driven like
        // the API surface
        val m = 2 + rnd.nextInt(4)
        val r = rnd.nextInt(m)
        t.deleteDeferred(col("id") % m === r, keys = Seq("id"), precombine = "ts")
        model = model.filter { case (k, _) => k % m != r }
      } else {
        val batch = randomBatch(rnd, 40, 10).groupBy(_._1).map(_._2.head).toSeq
          .map { case (k, v, _) => (k, v + s"_b$i", i.toLong) }
        t.upsertDeferred(batch.toDF("id", "v", "ts"), Seq("id"), "ts")
        batch.foreach(r => model += r._1 -> r)
      }
      val got = t.read().as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
      assert(got === model, s"RT view diverged from model after batch $i")
    }
    t.applyDeltas()
    val folded = t.read().as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(folded === model, "compacted view diverged from model")
    assert(t.deltaManifest().isEmpty)
  }

  test("conditioned MERGE clauses == model routing (update/delete/insert)") {
    val target = Seq((1L, 10L), (2L, 25L), (3L, 30L), (4L, 45L)).toDF("id", "n")
    val source = Seq((2L, 100L), (3L, 100L), (5L, 55L), (6L, 60L)).toDF("id", "n")
    val t = SnapshotTable.create(spark, tmpDir("clauses"), target)
    t.merge(source, col("t.id") === col("s.id"))
      .whenMatched(col("t.n") % 10 === 5).delete()
      .whenMatched().updateAll()
      .whenNotMatched(col("s.n") % 2 === 0).insertAll()
      .execute()
    // model, clause by clause:
    //  id=1: no source row → untouched           → (1, 10)
    //  id=2: matched, 25 % 10 == 5 → DELETE
    //  id=3: matched, 30 % 10 != 5 → UPDATE *    → (3, 100)
    //  id=4: no source row → untouched           → (4, 45)
    //  id=5: source-only, 55 odd → no clause     → dropped
    //  id=6: source-only, 60 even → INSERT *     → (6, 60)
    val expected = Set((1L, 10L), (3L, 100L), (4L, 45L), (6L, 60L))
    assert(t.read().as[(Long, Long)].collect().toSet === expected)
  }
}
