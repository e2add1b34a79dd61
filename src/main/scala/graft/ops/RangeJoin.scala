package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Interval/range join via binning — `point BETWEEN start AND end` joins
 * without the nested-loop plan Spark falls back to for pure inequality
 * conditions (SURVEY.md §2.4 gap class).
 *
 * Each interval is exploded onto the fixed-width bins it covers; each
 * point maps to exactly one bin; the join is then an EQUI-join on
 * (keys, bin) plus the exact range filter. A point meets an interval in
 * precisely one bin (the point's own), so no dedup is needed. Cost:
 * O(intervals · avg-bins-per-interval + points), shuffle-partitioned by
 * (keys, bin) — scale-safe as long as `binWidth` is on the order of the
 * typical interval length.
 */
object RangeJoin {

  /**
   * Inner join of `intervals` (inclusive `[startCol, endCol]`) with
   * `points` (`pointCol`), equi-matched on `keys`. Output: all interval
   * columns, plus every non-key point column (prefixed `p_` on a name
   * collision). `asLong` maps the ordering type to Long (e.g.
   * `unix_micros(_)` for timestamps); defaults to a plain long cast.
   */
  def intervalPointJoin(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      pointCol: String,
      binWidth: Long,
      asLong: Column => Column = _.cast("long")): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!intervals.columns.contains("__bin") && !points.columns.contains("__bin"),
      "intervalPointJoin reserves the __bin column name")

    // rename colliding non-key point columns up front so the joined output
    // has unambiguous names
    val collide = points.columns.toSet
      .intersect(intervals.columns.toSet)
      .diff(keys.toSet)
    val pPrep = collide.foldLeft(points)((df, c) => df.withColumnRenamed(c, s"p_$c"))
    val pCol = if (collide.contains(pointCol)) s"p_$pointCol" else pointCol
    val pPayload = pPrep.columns.toSeq.filterNot(keys.contains)

    // exact integer floor-division via decimal: long/long in Spark is
    // DOUBLE division, which mis-bins values beyond 2^53 (nanosecond
    // epochs, large surrogate ids) and silently drops genuine matches
    def binOf(c: Column): Column =
      floor(asLong(c).cast("decimal(38,0)") / lit(binWidth)).cast("long")
    val binnedI = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol))))).alias("i")
    val binnedP = pPrep.withColumn("__bin", binOf(col(pCol))).alias("b")

    val cond = (keys.map(k => col(s"i.$k") === col(s"b.$k")) :+
      (col("i.__bin") === col("b.__bin"))).reduce(_ && _)
    binnedI.join(binnedP, cond, "inner")
      .filter(asLong(col(s"i.$startCol")) <= asLong(col(s"b.$pCol")) &&
        asLong(col(s"b.$pCol")) <= asLong(col(s"i.$endCol")))
      .select(intervals.columns.toSeq.map(c => col(s"i.$c")) ++
        pPayload.map(c => col(s"b.$c")): _*)
  }
}
