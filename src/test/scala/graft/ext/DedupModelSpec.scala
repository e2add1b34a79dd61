package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Model-based randomized check for the incremental dedup cycle
 * ([[Dedup.minhashSignatures]] / [[Dedup.dedupIncremental]]): a
 * multi-batch ingest over EXACT-duplicate texts vs a plain Scala
 * set/map simulation. Exact copies make MinHash deterministic
 * (identical text → identical signature → est 1.0 in every band), so
 * the model cannot drift from the engine on estimator noise — it
 * checks the ORCHESTRATION: index growth, within-batch grouping,
 * corpus-contaminated-component drops, survivor selection.
 */
class DedupModelSpec extends SparkSpec {
  import spark.implicits._

  // texts long enough to shingle (>= 3 tokens), drawn from a pool so
  // batches collide with the index and within themselves
  private def text(k: Int): String =
    s"document body number $k with enough distinct tokens to shingle cleanly $k end"

  test("multi-batch incremental dedup == set-model ingest (seeded random, 6 batches)") {
    val rnd = new Random(1234)
    var nextId = 0L
    def freshId(): Long = { nextId += 1; nextId }

    // engine state: the signature index as a growing frame
    var index = Dedup.minhashSignatures(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text")
      .localCheckpoint()
    // model state: the set of text keys already ingested
    var ingested = Set.empty[Int]
    var survivorsAll = Set.empty[Long]
    var modelSurvivors = Set.empty[Long]

    (1 to 6).foreach { round =>
      // each batch: some texts fresh to the world, some already
      // ingested, some repeated WITHIN the batch
      val keys = Seq.fill(8 + rnd.nextInt(8))(rnd.nextInt(10 * round) + 1)
      val batch = keys.map(k => (freshId(), k))
      val batchDf = batch.map { case (id, k) => (id, text(k)) }.toDF("id", "text")

      val survivors = Dedup.dedupIncremental(index, batchDf, "id", "text", minEst = 0.9)
        .select("id").as[Long].collect().toSet

      // model: per text key, the batch's minimum id survives iff the
      // key was not already ingested; everything else drops
      val expected = batch.groupBy(_._2).collect {
        case (k, rows) if !ingested.contains(k) => rows.map(_._1).min
      }.toSet
      assert(survivors === expected, s"round $round: got $survivors want $expected")

      // advance both worlds
      val survivorsDf = batchDf.filter(col("id").isin(survivors.toSeq: _*))
      index = index.unionByName(
        Dedup.minhashSignatures(survivorsDf, "id", "text")).localCheckpoint()
      ingested ++= batch.map(_._2)
      survivorsAll ++= survivors
      modelSurvivors ++= expected
    }
    // end state: one survivor per distinct text key ever seen
    assert(survivorsAll === modelSurvivors)
    assert(survivorsAll.size === ingested.size)
    Dedup.release(index)
  }
}
