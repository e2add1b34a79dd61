package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Skew mitigation for hot join keys: salt the skewed (large) side with a
 * random factor in [0, salt) and replicate the other side across all salt
 * values, turning one hot shuffle partition into `salt` even ones. AQE's
 * skew-join split handles moderate skew automatically; explicit salting
 * is for the pathological single-key case (e.g. a null-heavy or
 * celebrity key) where one reducer would otherwise own the whole key.
 *
 * Use when the replicated side is small enough to multiply by `salt`
 * (dimension tables); the salted side's rows are never replicated.
 *
 * Supported join types: inner, left/left_outer, left_semi, left_anti —
 * the ones where unmatched REPLICATED-side rows never surface. Right and
 * full outer are rejected: the replicated side's unmatched rows exist
 * once per salt value and would emit `salt` duplicates.
 */
object SkewJoin {

  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedEquiJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salt: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // the normalized form is also what reaches join() — Spark strips
    // underscores but not spaces, so "left outer" must not leak through
    val normalizedType = joinType.toLowerCase.replace(" ", "_")
    require(SupportedJoinTypes.contains(normalizedType),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti joins only, got '$joinType': " +
        "unmatched replicated-side rows would be emitted once per salt value")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "saltedEquiJoin reserves the __salt column name")
    val saltedL = skewed.withColumn("__salt",
      (rand(42) * salt).cast("int"))
    val replicatedR = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val cond = (keys.map(k => saltedL(k) === replicatedR(k)) :+
      (saltedL("__salt") === replicatedR("__salt"))).reduce(_ && _)
    val joined = saltedL.join(replicatedR, cond, normalizedType)
    // drop the replicated side's key + salt copies, keep one of each
    val dropCols = keys.map(replicatedR(_)) :+ replicatedR("__salt") :+ saltedL("__salt")
    dropCols.foldLeft(joined)(_ drop _)
  }
}
