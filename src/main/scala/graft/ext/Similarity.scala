package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), SURVEY.md §7.5 north star.
 *
 * Two paths:
 *  - [[bruteForceTopK]] — the exactness baseline: broadcast the (small)
 *    probe set against the corpus (BroadcastNestedLoopJoin), cosine in
 *    double via the codegen'd [[CosineSimilarity]] expression, per-probe
 *    top-k via window. Corpus side streams; probe side must be small.
 *  - [[lshTopK]] — the scale path: hyperplane-LSH bucket equi-join
 *    (shuffle partitioned by bucket, never a cross join), multi-probe via
 *    several seeds, exact cosine re-rank of candidates. Recall < 1 by
 *    construction; increase seeds/lower planes to trade cost for recall.
 */
object Similarity {

  /** Exact top-k neighbors per probe row. `probes` must be broadcast-small
   *  (it is sent to every executor). Self-pairs are excluded when probe
   *  and corpus ids collide. */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Approximate top-k: candidates from multi-probe hyperplane-LSH bucket
   *  collisions, exact cosine re-rank. Both sides shuffle on (seed,
   *  bucket) — scale-safe for corpus-sized probe sets too. */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      planes: Int = 8,
      seeds: Seq[Long] = Seq(42L, 4242L, 424242L)): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String) =
      seeds.map { s =>
        df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
          .withColumn("seed", lit(s))
          .withColumn("bucket", functions.hyperplaneBucket(col(vecAs), planes, s))
      }.reduce(_ unionByName _)
    val c = bucketed(corpus, "n_id", "n_vec")
    val q = bucketed(probes, "q_id", "q_vec")
    val candidates = q.join(c,
        q("seed") === c("seed") && q("bucket") === c("bucket") &&
          col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
      .dropDuplicates("q_id", "n_id")
    val scored = candidates
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
