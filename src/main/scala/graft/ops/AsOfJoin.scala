package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * As-of (backward) join — for each left row, the single right row with the
 * greatest `rightTs <= leftTs` within the same key (the time-series
 * point-in-time join Spark lacks natively; SURVEY.md §2.4 gap class).
 *
 * Formulation: tag and union both sides, then one `last(_, ignoreNulls)`
 * running window per key ordered by (ts, side) — right rows sort before
 * left rows at equal timestamps, so the match is inclusive. Exactly ONE
 * shuffle+sort partitioned by key, independent of how many right rows
 * precede each left row: no range-explosion, no broadcast, no
 * per-row subquery — the scale-safe shape for 100 TB event streams.
 */
object AsOfJoin {

  /**
   * @param keys       equi-join key columns (same names on both sides)
   * @param leftTs     left timestamp/ordering column
   * @param rightTs    right timestamp/ordering column
   * @param tolerance  optional max (leftTs - rightTs), e.g.
   *                   `expr("INTERVAL 1 HOUR")`; matches older than this
   *                   become NULL (standard asof-tolerance semantics)
   *
   * Output: all left columns, plus every non-key right column (matched
   * value or NULL). Right columns whose names collide with left ones are
   * prefixed with `r_`.
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val reserved = Seq("__ts", "__side", "__r", "__match")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asof join reserves column names ${reserved.mkString(", ")}")
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // a NULL right timestamp satisfies no `rightTs <= leftTs` — and it
    // would sort NULLS FIRST, where the running last() would hand its
    // payload to left rows as a spurious "earliest" match
    val rTagged = right
      .filter(col(rightTs).isNotNull)
      .select((keys.map(col) :+
        col(rightTs).as("__ts") :+
        struct(rPayloadCols.map(col): _*).as("__r")): _*)
      .withColumn("__side", lit(0))

    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__match",
          when(col("__match").isNotNull &&
            col(leftTs) <= col(s"__match.$rightTs") + tol, col("__match")))
      case None => matched
    }

    val leftCols = left.columns.toSeq
    val outRight = rPayloadCols.map { c =>
      val name = if (leftCols.contains(c)) s"r_$c" else c
      col(s"__match.$c").as(name)
    }
    withTol.select(leftCols.map(col) ++ outRight: _*)
  }
}
