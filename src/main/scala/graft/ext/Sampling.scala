package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Reproducible sampling and data mixing for training-data pipelines.
 *
 * Random sampling (`df.sample`, `sampleBy`) is seed- and partitioning-
 * dependent: re-running the pipeline, repartitioning the input, or
 * porting to another engine changes WHICH rows are kept. A corpus build
 * needs the opposite — the same document set selected on every run,
 * every engine, every cluster size. The standard trick is a
 * deterministic hash of the document id compared against the rate, and
 * to keep the selection replayable by non-Spark auditors the hash here
 * is pure BIGINT arithmetic (two multiplicative-congruential rounds mod
 * a prime — Knuth's constant), not an engine-specific hash function.
 *
 * Everything is a map-side codegen'd projection/filter — no shuffle, no
 * RNG state, trivially scales to any corpus size. Ids are assumed
 * non-negative (the usual case; negative ids would need `pmod` on the
 * replaying engine too).
 */
object Sampling {

  /** Prime modulus: buckets are in `[0, Modulus)`. */
  val Modulus: Long = 1000000007L

  /** Knuth's multiplicative-hash constant (2^32 · φ⁻¹). */
  val Mult: Long = 2654435761L

  /** Default salt — referenced by the q52 oracle; change both together. */
  val DefaultSalt: Long = 40503L

  /** Deterministic bucket of `id` in `[0, Modulus)`. The id is reduced
   *  mod the prime FIRST so the subsequent multiplies stay inside Long
   *  range for any id (no ANSI overflow at 100 TB id scales); two rounds
   *  decorrelate sequential ids well enough for rate-accurate sampling. */
  def hashBucket(id: Column, salt: Long = DefaultSalt): Column = {
    val reduced = pmod(id, lit(Modulus))
    val r1 = pmod(reduced * lit(Mult) + lit(salt), lit(Modulus))
    pmod(r1 * lit(Mult) + lit(salt), lit(Modulus))
  }

  /** The bucket threshold selecting a `fraction` of ids. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    (fraction * Modulus).toLong
  }

  /** Keep a deterministic `fraction` of rows by id hash — same selection
   *  on every run and engine. */
  def sample(df: DataFrame, idCol: String, fraction: Double, salt: Long = DefaultSalt): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < lit(threshold(fraction)))

  /**
   * Per-group reproducible mixing (the corpus-composition step of a
   * training-data build: "90% of en, 50% of de, drop zh"): keep a row of
   * group `g` with rate `fractions(g)`, decided purely by the id hash.
   * Groups not listed are DROPPED. The rate lookup is a when-chain —
   * map-side, codegen'd, no join — sized for the handful of groups a
   * mixing config realistically has.
   */
  def mixByGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      fractions: Map[String, Double],
      salt: Long = DefaultSalt): DataFrame = {
    val cutoff = fractions.foldLeft(lit(-1L)) { case (acc, (g, f)) =>
      when(col(groupCol) === lit(g), lit(threshold(f))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < cutoff)
  }

  /**
   * TEMPERATURE-balanced corpus mixing — the multilingual sampling rule
   * (mT5 / XLM-R and the Llama-family data recipes): group `g`'s
   * expected share of the ~`targetRows` output is
   * `count_g^(1/temperature) / Σ count^(1/temperature)`. T > 1 flattens
   * toward uniform (small languages upsample — capped at keeping every
   * row, rates clamp to 1), T < 1 sharpens toward the head, T = 1 is
   * proportional (uniform rate across groups). Selection rides the same
   * deterministic id-hash arithmetic as [[mixByGroup]]; the derived
   * rates are floored to a 1e-6 grid, so an external engine replaying
   * the derivation lands on the identical rate even when its `pow`
   * differs in the last ulp. `z` sums in group-key order (doubles are
   * order-sensitive; exact-replay oracles additionally pick a
   * temperature whose power is exact, e.g. 1/T = 2).
   *
   * One |groups|-row aggregate to the driver derives the rates; the
   * selection itself is [[mixByGroup]]'s map-side codegen'd filter —
   * nothing else moves. NULL-group rows are dropped, as [[mixByGroup]]
   * drops unlisted groups.
   */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      targetRows: Long,
      temperature: Double,
      salt: Long = DefaultSalt): DataFrame = {
    require(temperature > 0.0, s"temperature $temperature must be > 0")
    require(targetRows > 0, s"targetRows $targetRows must be > 0")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val z = counts.map { case (_, c) => math.pow(c.toDouble, 1.0 / temperature) }.sum
    val fractions = counts.map { case (g, c) =>
      val w = math.pow(c.toDouble, 1.0 / temperature)
      // association fixed as (N·w)/(z·c) — the form an oracle replays
      val f0 = (targetRows * w) / (z * c)
      g -> math.floor(math.min(1.0, f0) * 1e6) / 1e6
    }.toMap
    mixByGroup(df, idCol, groupCol, fractions, salt)
  }

  /**
   * Deterministic train/val/test split assignment: every row gets a
   * `split` label decided purely by its id hash against cumulative
   * fraction cutoffs — the same row lands in the same split on every
   * run, engine, and cluster size (the property an eval set must have:
   * a val document must never drift into train on a rebuild). Fractions
   * must sum to 1 (±1e-9); labels are assigned in the given order, so
   * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` maps buckets
   * [0, .9) / [.9, .95) / [.95, 1). Map-side projection — no shuffle.
   */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: Long = DefaultSalt): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0),
      "assignSplits needs non-negative fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail.map(threshold)
    val bucket = hashBucket(col(idCol), salt)
    // last label as the fall-through so rounding at the top edge cannot
    // leave a row unlabeled
    val label = fractions.init.zip(cuts).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), cut), elseCol) => when(bucket < lit(cut), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", label)
  }

  /**
   * Deterministic epoch shuffle: a rebuild-stable pseudo-random GLOBAL
   * training order for the corpus, one per `epoch` — what a data loader
   * needs from "shuffle each epoch" without RNG state: the same epoch
   * produces the same order on every run, engine, and cluster size, and
   * different epochs produce decorrelated orders (the epoch folds into
   * the hash salt). Returns the rows sorted in shuffle order with a
   * contiguous `pos` column (0-based).
   *
   * Scale shape: the sort is Spark's standard range-partitioned total
   * sort (the one shuffle the semantics require), and `pos` comes from
   * `zipWithIndex` — per-partition offsets from one lightweight count
   * pass — NOT from a global `row_number()` window, which would funnel
   * the whole corpus through a single reducer. Ties on the hash bucket
   * (birthday-likely at ~10⁹ rows against the 1e9+7 modulus) break on
   * the id, so the order is total and deterministic.
   */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      epoch: Long,
      salt: Long = DefaultSalt): DataFrame = {
    // additive epoch mixing stays inside the replayable BIGINT recipe;
    // the multiplicative rounds decorrelate consecutive epochs
    val epochSalt = salt + epoch
    val sorted = df.orderBy(hashBucket(col(idCol), epochSalt).asc, col(idCol).asc)
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /**
   * Token-budget corpus selection — "the best documents per source whose
   * cumulative token count fits the budget", the data-mixing primitive
   * for hitting a training recipe's per-source token targets. Greedy
   * strict-prefix semantics: rank each group by (`scoreCol` DESC,
   * `idCol` ASC) and keep the maximal prefix whose INCLUSIVE running
   * `weightCol` sum stays ≤ `budget` (the running sum is monotone, so
   * the kept set is exactly a prefix — trivially replayable as one SQL
   * window cumsum). Rows with NULL score or weight are excluded.
   *
   * Scale shape (the q56 lesson, prefix-sum edition): a single
   * `sum() OVER (PARTITION BY group ORDER BY …)` funnels every row of a
   * hot source through one sorting reducer. Instead, a HISTOGRAM
   * two-phase: scores quantize into `buckets` slots (scores are
   * [0,1]-ish quality values; out-of-range clamps), one tiny
   * per-(group, bucket) weight-sum aggregate classifies every bucket by
   * its exclusive prefix total — buckets fully inside the budget keep
   * all rows with NO window, buckets fully past it drop map-side, and
   * only the ONE boundary bucket per group ranks its own rows
   * (offset by the bucket prefix). Reducer work is bounded by the
   * boundary bucket's size, not the group's.
   */
  def budgetPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      weightCol: String,
      idCol: String,
      budget: Long,
      buckets: Int = 1024): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(buckets > 0, s"buckets $buckets must be positive")
    val b = "__graft_budget_bucket"
    val wsum = "__graft_budget_wsum"
    val above = "__graft_budget_above"
    val cum = "__graft_budget_cum"
    // floor quantization is order-preserving, so bucket order == score
    // order and equal scores never straddle a bucket edge — the
    // within-bucket (score, id) sort IS the global order restricted to
    // the bucket, which is what makes the decomposition exact
    val bucketed = df
      .filter(col(scoreCol).isNotNull && col(weightCol).isNotNull)
      .withColumn(b, least(lit(buckets), greatest(lit(0),
        floor(col(scoreCol) * buckets))).cast("int"))
    val hist = bucketed.groupBy(col(groupCol), col(b))
      .agg(sum(col(weightCol)).as(wsum))
    val wAbove = Window.partitionBy(col(groupCol)).orderBy(col(b).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val classified = hist
      .withColumn(above, coalesce(sum(col(wsum)).over(wAbove), lit(0L)))
    val joined = bucketed.join(classified, Seq(groupCol, b))
    val fullKeep = col(above) + col(wsum) <= budget
    // strict >: a bucket whose exclusive prefix EQUALS the budget still
    // routes to the boundary window — its zero-weight rows have inclusive
    // cumsum == budget and the oracle's `cum <= budget` keeps them
    val fullDrop = col(above) > budget
    val helperCols = Seq(b, wsum, above)
    val kept = joined.filter(fullKeep).drop(helperCols: _*)
    // boundary rows: exactly one bucket per group reaches here, so the
    // window sorts bucket-sized slices, never whole groups
    val wIn = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundaryKept = joined.filter(!fullKeep && !fullDrop)
      .withColumn(cum, sum(col(weightCol)).over(wIn))
      .filter(col(above) + col(cum) <= budget)
      .drop((helperCols :+ cum): _*)
    // join re-ordered columns (keys first); restore the caller's layout
    kept.unionByName(boundaryKept).select(df.columns.map(col).toSeq: _*)
  }

  /**
   * Deterministic Gumbel top-k — sampling WITHOUT replacement,
   * probability proportional to exp(score/temperature), as one ranking
   * pass (the Gumbel-max trick: adding independent Gumbel noise to each
   * score and taking the top k IS weighted sampling without
   * replacement). This is DSIR's resampling step over
   * [[TextAnalysis.dsirWeights]] scores, made rebuild-stable: the
   * "noise" g = −ln(−ln(u)) draws its uniform u from the engine-portable
   * id hash (u = (bucket + 0.5)/Modulus — the +0.5 keeps u strictly
   * inside (0,1), so the double log never sees 0), NOT from RNG state —
   * the same k documents are selected on every run, engine, and
   * partitioning, and an external auditor replays the exact draw.
   * Lower `temperature` sharpens toward pure top-k by score; higher
   * flattens toward uniform.
   *
   * Scale shape: orderBy(...).limit(k) plans as TakeOrderedAndProject —
   * per-partition top-k then a driver merge of k-row heaps, never a
   * global sort shuffle.
   *
   * Output: the input columns plus the ranking key as `gumbel_key` — a
   * pre-existing column of that name is REPLACED (withColumn
   * semantics).
   */
  def gumbelTopK(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      k: Int,
      temperature: Double = 1.0,
      salt: Long = DefaultSalt): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(temperature > 0, s"temperature $temperature must be positive")
    val u = (hashBucket(col(idCol), salt).cast("double") + lit(0.5)) / lit(Modulus.toDouble)
    val key = col(scoreCol) / lit(temperature) - log(-log(u))
    df.withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Per-group capping — "keep at most `n` documents per domain, best
   * first" — the heavy-hitter-domain control every web-corpus build runs
   * (a handful of boilerplate-heavy domains otherwise dominate the
   * training mix).
   *
   * A single `row_number() OVER (PARTITION BY group)` shuffles EVERY row
   * of a hot domain to one reducer — the classic top-k skew wall at
   * corpus scale. This runs the standard two-phase (salted) top-k
   * instead:
   *
   *  1. rank within (group, input-partition) — the input partition id
   *     spreads a hot group over the whole cluster — and keep the local
   *     top `n`: any row in the global top `n` of its group is
   *     necessarily in the top `n` of whichever slice it sits in, so
   *     this phase is lossless;
   *  2. rank the ≤ n·partitions survivors per group and keep the true
   *     top `n`.
   *
   * Both phases shuffle, but phase 2 moves at most `n` rows per
   * (group, slice) instead of the whole corpus. The result is
   * deterministic and layout-independent as long as `orderBy` is a
   * total order (tie-break on a unique id).
   */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      orderBy: Seq[Column],
      n: Int): DataFrame = {
    require(n > 0, s"cap $n must be positive")
    // helper names prefixed against collision with caller columns
    val (slice, rn) = ("__graft_cap_slice", "__graft_cap_rn")
    val local = df
      .withColumn(slice, spark_partition_id())
      .withColumn(rn, row_number().over(
        Window.partitionBy(col(groupCol), col(slice)).orderBy(orderBy: _*)))
      .filter(col(rn) <= n)
      .drop(slice, rn)
    local
      .withColumn(rn, row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)))
      .filter(col(rn) <= n)
      .drop(rn)
  }
}
