package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), SURVEY.md §7.5 north star.
 *
 * Three paths:
 *  - [[bruteForceTopK]] — the exactness baseline: broadcast the (small)
 *    probe set against the corpus (BroadcastNestedLoopJoin), cosine in
 *    double via the codegen'd [[CosineSimilarity]] expression, per-probe
 *    top-k via window. Corpus side streams; probe side must be small.
 *  - [[lshTopK]] — data-independent scale path: hyperplane-LSH bucket
 *    equi-join (shuffle partitioned by bucket, never a cross join),
 *    multi-probe via several seeds, exact cosine re-rank of candidates.
 *    Recall < 1 by construction; increase seeds/lower planes to trade
 *    cost for recall.
 *  - [[ivfTopK]] — data-ADAPTIVE scale path (FAISS IVF-Flat semantics):
 *    spherical k-means coarse quantizer trained on a bounded sample
 *    (driver-side, like FAISS), corpus rows assigned map-side to their
 *    nearest centroid's inverted list, queries probe their `nProbe`
 *    nearest lists, exact cosine re-rank of just those lists. With
 *    `nProbe = nlist` the search is exhaustive (exact).
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

  /**
   * Spherical k-means coarse quantizer: Lloyd's iterations over a
   * DETERMINISTIC bounded sample (first `sampleN` rows by `idCol`),
   * driver-side — the FAISS training recipe; only the O(sample · nlist)
   * training is central, assignment stays distributed. Centroids are
   * unit-normalized so nearest-by-dot ≡ nearest-by-cosine.
   */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 5,
      sampleN: Int = 10000): Array[Array[Float]] = {
    require(nlist >= 1, "nlist must be >= 1")
    // deterministic UNBIASED sample: smallest-N by id hash (TakeOrdered:
    // per-partition top-N, no shuffle). Ordering by raw id would train
    // the quantizer on the oldest documents only when ids track ingest
    // time — the usual case — and skew centroids away from newer data.
    val sample = corpus.select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "cannot train IVF centroids on an empty corpus")
    def normalized(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val inv = if (s > 0) 1.0 / math.sqrt(s) else 0.0
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
      out
    }
    // a single NaN component would poison its centroid and, through it,
    // every later assignment — corrupt vectors don't get a vote
    val unit = sample.filterNot(_.exists(_.isNaN)).map(normalized)
    require(unit.nonEmpty, "cannot train IVF centroids: all sampled vectors are NaN")
    val k = math.min(nlist, unit.length)
    // deterministic spread init: every (n/k)-th sample vector
    var cents = Array.tabulate(k)(i => unit((i.toLong * unit.length / k).toInt).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](unit(0).length))
      val counts = new Array[Int](k)
      unit.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var ci = 0
        while (ci < k) {
          var dot = 0.0; var i = 0
          val c = cents(ci)
          while (i < v.length) { dot += v(i).toDouble * c(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = ci }
          ci += 1
        }
        val s = sums(best)
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { ci =>
        if (counts(ci) == 0) cents(ci) // empty list: keep the old centroid
        else normalized(sums(ci).map(_.toFloat))
      }
    }
    cents
  }

  /**
   * IVF-Flat approximate top-k: assign the corpus to inverted lists
   * (map-side, codegen'd [[NearestLists]]), probe each query's `nProbe`
   * nearest lists via a (list-id) equi-join — hash-partitioned, never a
   * cross join — and re-rank candidates by exact cosine. `nProbe = nlist`
   * probes every list → exhaustive (exact) search.
   */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nlist: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5,
      sampleN: Int = 10000): DataFrame = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters, sampleN)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("list",
        element_at(functions.nearestLists(col("n_vec"), cents, 1), 1))
    val q = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("list",
        explode(functions.nearestLists(col("q_vec"), cents, math.min(nProbe, cents.length))))
    val candidates = q.join(c, q("list") === c("list") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
    val scored = candidates
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
