package graft.tables

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Randomized soundness fuzz for stats pruning: for ANY predicate,
 * `scan(pred)` must return exactly `read().filter(pred)` — pruning may
 * only ever skip files that cannot match (a pruning bug is a silent
 * wrong result, the worst failure class this table has).
 */
class PruningPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomPredicate(rnd: Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(8) match {
      case 0 => col("k") === rnd.nextInt(400)
      case 1 => col("k") > rnd.nextInt(400)
      case 2 => col("k") <= rnd.nextInt(400)
      case 3 => col("w").startsWith(("" + ('a' + rnd.nextInt(26)).toChar) *
        (1 + rnd.nextInt(2)))
      case 4 => col("w") === s"s${rnd.nextInt(300)}"
      case 5 => col("d") < rnd.nextDouble() * 400
      case 6 => col("k").isin(Seq.fill(3)(rnd.nextInt(400)).map(Integer.valueOf): _*)
      case _ => col("m").isNull
    }
    if (depth <= 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => randomPredicate(rnd, depth - 1) && randomPredicate(rnd, depth - 1)
      case 1 => randomPredicate(rnd, depth - 1) || randomPredicate(rnd, depth - 1)
      case _ => leaf()
    }
  }

  // three commits, mixed types, some nulls, overlapping ranges
  private def buildTable(): SnapshotTable = {
    val t = SnapshotTable(spark, tmpDir("fuzz"))
    def batch(lo: Int, hi: Int) =
      spark.range(lo, hi).toDF("id")
        .withColumn("k", (col("id") * 7 % 400).cast("int"))
        .withColumn("w", concat(lit("s"), (col("id") % 300).cast("string")))
        .withColumn("d", col("id").cast("double") * 1.5)
        .withColumn("m", when(col("id") % 5 === 0, col("id")).otherwise(lit(null)))
    t.overwrite(batch(0, 150))
    t.append(batch(100, 260))
    t.append(batch(250, 400))
    t
  }

  test("scan(pred) == read().filter(pred) for 40 random predicates") {
    val rnd = new Random(20260812L)
    val t = buildTable()
    val full = t.read().cache()
    try {
      (1 to 40).foreach { i =>
        val pred = randomPredicate(rnd, depth = 2)
        val expected = full.filter(pred).select("id").as[Long].collect().sorted.toSeq
        val got = t.scan(pred).select("id").as[Long].collect().sorted.toSeq
        assert(got === expected, s"predicate #$i diverged: $pred")
      }
    } finally full.unpersist()
  }

  test("update(pred) touches exactly the rows read().filter(pred) would") {
    // the same soundness bar for the UPDATE path: stats-pruned touched-file
    // discovery must never miss a matching row (silent non-update) nor
    // corrupt a non-matching one
    val rnd = new Random(424242L)
    (1 to 8).foreach { i =>
      val t = buildTable()
      val pred = randomPredicate(rnd, depth = 1)
      val expected = t.read().withColumn("tag",
          when(pred, lit("hit")).otherwise(lit("miss")))
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      t.update(pred, Map("w" -> lit("hit")))
      val got = t.read().withColumn("tag",
          when(col("w") === "hit", lit("hit")).otherwise(lit("miss")))
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      assert(got.getOrElse("hit", 0L) === expected.getOrElse("hit", 0L),
        s"update #$i rows diverged for: $pred")
      assert(got.getOrElse("miss", 0L) === expected.getOrElse("miss", 0L),
        s"update #$i untouched rows diverged for: $pred")
    }
  }
}
