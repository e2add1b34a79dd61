package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share at least
 * one word n-gram with an evaluation corpus, the standard guard against
 * test-set leakage when assembling LLM training data (n-gram-overlap
 * filtering as popularized by the GPT-3 / Gopher / Llama data papers).
 *
 * Scale shape (the 100 TB case): evaluation benchmarks are small by
 * construction (10⁴–10⁶ question strings), so their distinct shingle
 * hashes broadcast and the training corpus is NEVER shuffled — each scan
 * partition probes the broadcast hash set via a left-semi
 * BroadcastHashJoin, and only the (tiny) contaminated id set moves.
 * Shingles are 64-bit hashes off the UTF-8 bytes ([[TextHash
 * .hashedShingles]]), so the probe moves longs, not strings; collisions
 * (~|corpus shingles|·|bench shingles|/2⁶⁴) can only ADD a false
 * contamination flag, never lose one — the conservative direction for
 * decontamination. For an unusually large benchmark set pass
 * `broadcastBenchmark = false` to fall back to a shuffled equi-semi-join
 * on the shingle hash.
 */
object Decontaminate {

  /** Distinct `idCol` values of corpus documents sharing at least one
   *  word n-gram with any row of `benchmark`. Documents shorter than
   *  `n` tokens have no shingles and are never flagged. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val benchSh0 = benchmark
      .select(explode(functions.hashedShingles(col(benchTextCol), n)).as("s"))
      .distinct()
    val benchSh = if (broadcastBenchmark) broadcast(benchSh0) else benchSh0
    corpus
      .select(col(idCol), explode(functions.hashedShingles(col(textCol), n)).as("s"))
      .join(benchSh, Seq("s"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** The corpus with an appended boolean `contaminated` column (every
   *  input row preserved). Drop the flagged rows with
   *  `flag(...).filter(!col("contaminated"))` to decontaminate. */
  def flag(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame = {
    // internal hit-marker name: a corpus that ALREADY carries a
    // `contaminated` column (re-flagging a previous pass) must not make
    // the join ambiguous — the final withColumn simply replaces it
    val hits =
      contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n,
          broadcastBenchmark)
        .withColumn("__contam_hit", lit(true))
    // null-safe join key: a NULL-id contaminated row must keep its flag
    // (a plain equi-join never matches NULL and would silently clear it,
    // breaking the "collisions only ADD flags" guarantee)
    val h = hits.withColumnRenamed(idCol, "__contam_id")
    corpus.join(h, corpus(idCol) <=> h("__contam_id"), "left")
      .withColumn("contaminated", coalesce(col("__contam_hit"), lit(false)))
      .drop("__contam_hit", "__contam_id")
  }

  /**
   * Per-document contamination REPORT: how much of each document's
   * distinct n-gram set appears in the benchmark — the graded score
   * behind threshold-based decontamination policies (the GPT-3 appendix
   * / Llama data-paper "high-overlap document" rules pick a cutoff on
   * exactly this fraction; [[flag]] is the `frac > 0` special case).
   * Returns every corpus row as `(id, matched, total, frac)` with
   * `frac = matched / total` over DISTINCT grams ([[TextHash
   * .hashedShingles]] already emits each document's distinct sorted
   * hashes); documents shorter than `n` tokens report `(0, 0, 0.0)`.
   *
   * Same scale shape as [[contaminatedIds]]: the benchmark's distinct
   * hashes broadcast, and the corpus tokenizes + shingle-hashes ONCE —
   * a single explode carrying the per-document total, one broadcast
   * LEFT join marking hits, one per-document aggregate. (A semi-join
   * branch plus a separate total branch would run the dominant
   * tokenize-hash pass twice.)
   */
  def overlapReport(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      broadcastBenchmark: Boolean = true): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val benchSh0 = benchmark
      .select(explode(functions.hashedShingles(col(benchTextCol), n)).as("s"))
      .distinct()
      .withColumn("__hit", lit(true))
    val benchSh = if (broadcastBenchmark) broadcast(benchSh0) else benchSh0
    corpus
      .select(col(idCol).as("id"), functions.hashedShingles(col(textCol), n).as("sh"))
      // explode_outer: a doc shorter than n keeps its row (s NULL, total 0)
      .select(col("id"),
        coalesce(size(col("sh")), lit(0)).cast("long").as("total"),
        explode_outer(col("sh")).as("s"))
      .join(benchSh, Seq("s"), "left")
      .groupBy("id")
      .agg(count(col("__hit")).as("matched"), max(col("total")).as("total"))
      .select(col("id"), col("matched"), col("total"),
        when(col("total") === 0, lit(0.0))
          .otherwise(col("matched").cast("double") / col("total"))
          .as("frac"))
  }

  /**
   * SEMANTIC decontamination: flag training documents whose embedding
   * sits within `minCos` cosine of ANY evaluation embedding — the
   * paraphrase leakage n-gram overlap cannot see (reworded benchmark
   * questions, translated answers), run as a second pass after
   * [[contaminatedIds]] the way DataComp/FineWeb-class pipelines stack
   * the two.
   *
   * Scale shape mirrors the n-gram path: benchmarks are small by
   * construction, so the benchmark embeddings BROADCAST and the corpus
   * never shuffles — each scan partition scores its vectors against the
   * broadcast set map-side (cost |corpus| · |bench| dot products; fine
   * to ~10⁵ bench vectors), and only the contaminated id set moves.
   * This is the EXACT kernel: every vector pair is scored, recall 1 by
   * construction. For an unusually large benchmark (stacked eval
   * suites), [[semanticContaminatedIdsAuto]] cuts over to an
   * LSH-bucketed regime instead of growing this broadcast without bound.
   */
  def semanticContaminatedIds(
      corpus: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      minCos: Double = 0.95): DataFrame = {
    require(minCos > 0.0 && minCos <= 1.0, s"minCos must be in (0, 1], got $minCos")
    corpus.select(col(idCol), col(vecCol).as("__c_vec"))
      .crossJoin(broadcast(benchmark.select(col(benchVecCol).as("__b_vec"))))
      .filter(functions.cosineSimilarity(col("__c_vec"), col("__b_vec")) >= minCos)
      .select(col(idCol))
      .distinct()
  }

  /**
   * [[semanticContaminatedIds]] with the broadcast-vs-bucketed regime
   * picked from the benchmark's actual size (one `count()` action,
   * metadata-cheap over parquet scans) — the entry point that stays safe
   * when "the benchmark" is every eval suite a lab decontaminates
   * against stacked together (10⁷⁺ vectors would otherwise be shipped to
   * every executor and dotted against every corpus row).
   *
   *  - `benchRows <= broadcastMaxBenchRows`: the exact broadcast kernel,
   *    unchanged — corpus never shuffles, recall 1.
   *  - above it: hyperplane-LSH bucketing on BOTH sides, equi-join on
   *    (seed, bucket), exact cosine filter inside the bucket. Planes are
   *    sized from the BENCHMARK row count (per-bucket bench load ≈
   *    `targetBucketRows`), so join work ≈ |corpus| · targetBucketRows
   *    per seed — linear in the corpus, never |corpus| · |bench|. Seeds
   *    come from the same [[Similarity.autoLshParams]] recall floor as
   *    the pair miner ([[Dedup.embeddingPairs]]). The corpus shuffles
   *    once per seed on the bucket key; seed count grows only
   *    logarithmically in the recall target.
   *
   * The bucketed regime is RECALL-ORIENTED like every LSH path here: a
   * contaminated pair colliding in no seed's bucket is missed
   * (probability bounded by `targetRecall`; raise it for a tighter
   * guarantee). Hyperplane buckets depend only on vector DIRECTION, so
   * anything the cosine threshold flags is bucketable — the two regimes
   * agree exactly on near-duplicate (high-cosine) contamination.
   */
  def semanticContaminatedIdsAuto(
      corpus: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      minCos: Double = 0.95,
      broadcastMaxBenchRows: Long = 100000,
      targetBucketRows: Long = 64,
      targetRecall: Double = 0.90): DataFrame = {
    require(minCos > 0.0 && minCos < 1.0, s"minCos must be in (0, 1), got $minCos")
    require(broadcastMaxBenchRows >= 0,
      s"broadcastMaxBenchRows must be >= 0, got $broadcastMaxBenchRows")
    // pin the projected benchmark FIRST and size from the pinned count
    // (the embeddingPairs rule): a benchmark built as its own
    // join/filter pipeline would otherwise execute once for the count
    // and again for the probe. The pinned blocks are benchmark-sized
    // and stay until GC — the small side by construction; the corpus is
    // never pinned.
    val bench = benchmark.select(col(benchVecCol).as("__b_vec")).localCheckpoint()
    val benchRows = bench.count()
    if (benchRows <= broadcastMaxBenchRows)
      corpus.select(col(idCol), col(vecCol).as("__c_vec"))
        .crossJoin(broadcast(bench))
        .filter(functions.cosineSimilarity(col("__c_vec"), col("__b_vec")) >= minCos)
        .select(col(idCol))
        .distinct()
    else {
      val (planes, seeds) =
        Similarity.autoLshParams(benchRows, targetBucketRows, minCos, targetRecall)
      // one pass per side for ALL seeds (Similarity.seedBucketed) — a
      // per-seed union would rescan the 100 TB corpus once per seed
      def bucketed(df: DataFrame, vec: String): DataFrame =
        Similarity.seedBucketed(df, vec, planes, seeds)
          .withColumnRenamed("seed", "__seed")
          .withColumnRenamed("bucket", "__bucket")
      val c = bucketed(corpus.select(col(idCol), col(vecCol).as("__c_vec")), "__c_vec")
      val b = bucketed(bench, "__b_vec")
      c.join(b, Seq("__seed", "__bucket"))
        .filter(functions.cosineSimilarity(col("__c_vec"), col("__b_vec")) >= minCos)
        .select(col(idCol))
        .distinct()
    }
  }
}
