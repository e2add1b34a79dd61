package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest right row at or before each left timestamp") {
    val quotes = Seq( // key, ts, px
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 50.0)).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", 5L, 100), ("A", 7L, 200), ("A", 0L, 300),
      ("B", 3L, 400), ("C", 8L, 500)).toDF("sym", "ts", "qty")
    val r = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", "ts")
      .select(col("sym"), col("ts"), col("qty"), col("px"))
      .as[(String, Long, Int, Option[Double])].collect().toSet
    assert(r === Set(
      ("A", 5L, 100, Some(11.0)), // inclusive: quote at ts=5 matches
      ("A", 7L, 200, Some(11.0)),
      ("A", 0L, 300, None), // no quote yet
      ("B", 3L, 400, None), // B's quote is later
      ("C", 8L, 500, None))) // unknown key
  }

  test("asof join: NULL timestamps never match (either side)") {
    val quotes = Seq(("A", Some(1L), 10.0), ("A", None: Option[Long], 99.0))
      .toDF("sym", "ts", "px")
    val trades = Seq(("A", Some(0L), 1), ("A", Some(2L), 2), ("A", None: Option[Long], 3))
      .toDF("sym", "ts", "qty")
    val r = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", "ts")
      .select(col("qty"), col("px")).as[(Int, Option[Double])].collect().toSet
    assert(r === Set(
      (1, None),        // trade at 0: no quote yet — the null-ts quote must not leak in
      (2, Some(10.0)),  // trade at 2: real quote at 1
      (3, None)))       // null-ts trade: matches nothing
  }

  test("asof join with tolerance nulls out stale matches") {
    val quotes = Seq(("A", 1L, 10.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", 2L, 1), ("A", 90L, 2)).toDF("sym", "ts", "qty")
    val r = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", "ts",
      tolerance = Some(lit(10L)))
      .select(col("qty"), col("px")).as[(Int, Option[Double])].collect().toSet
    assert(r === Set((1, Some(10.0)), (2, None)))
  }

  test("range join: points land in covering intervals only") {
    val intervals = Seq(
      (1, "u1", 0L, 100L), (2, "u1", 90L, 200L), (3, "u2", 0L, 50L))
      .toDF("iid", "user", "s", "e")
    val points = Seq(
      ("u1", 95L, "p1"), // in intervals 1 AND 2 (overlap region)
      ("u1", 150L, "p2"), // only interval 2
      ("u2", 60L, "p3"), // outside u2's interval
      ("u3", 10L, "p4")) // unknown key
      .toDF("user", "t", "name")
    val r = RangeJoin.intervalPointJoin(intervals, points,
      Seq("user"), "s", "e", "t", binWidth = 64)
      .select(col("iid"), col("name")).as[(Int, String)].collect().toSet
    assert(r === Set((1, "p1"), (2, "p1"), (2, "p2")))
  }

  test("range join plans as an equi-join, never a nested loop") {
    val intervals = spark.range(0, 1000).toDF("iid")
      .withColumn("s", col("iid") * 10).withColumn("e", col("iid") * 10 + 15)
    val points = spark.range(0, 5000).toDF("pid").withColumn("t", col("pid") * 2)
    val joined = RangeJoin.intervalPointJoin(intervals, points,
      keys = Seq.empty, "s", "e", "t", binWidth = 16)
    val plan = org.apache.spark.sql.graftshim.SparkInternals.executedPlanString(joined)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in range join:\n$plan")
    // sanity: every point in [s, e] counted
    assert(joined.count() ===
      intervals.crossJoin(points).filter(col("s") <= col("t") && col("t") <= col("e")).count())
  }
}
