package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Full-text relevance search over a document corpus — the retrieval
 * side of a training-data pipeline (inspect a corpus, mine seed sets,
 * audit what a filter kept) without any external search service.
 *
 * Scoring is Okapi BM25 (Robertson et al., the TREC formulation used
 * by Lucene/Elasticsearch):
 *
 *   score(d, Q) = Σ_{t ∈ Q} idf(t) · tf · (k1 + 1)
 *                           / (tf + k1 · (1 − b + b · dl/avgdl))
 *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
 *
 * Shape at scale: the corpus tokenizes map-side; rows are filtered to
 * the query's terms BEFORE any shuffle, so the per-term tf aggregate
 * only moves rows matching the handful of query terms. Document length
 * and corpus stats ride ordinary hash aggregates; the one-row corpus
 * stats frame joins back via broadcast. No UDFs, no driver-side
 * scoring, no inverted index to maintain — the index IS the shuffle.
 * Every arithmetic step is engine-portable (integer counts into an
 * IEEE-double formula), so an external SQL engine replays the exact
 * ranking.
 */
object Search {

  /**
   * Top-`k` documents for `query` by BM25, ties broken by ascending id
   * for a fully deterministic ranking. Returns (id, bm25) with the
   * score rounded to 4 decimals (cross-engine replay tolerance; the
   * ORDER is decided on the rounded score so rank and emitted value
   * can never disagree).
   */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k $k must be positive")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, b in [0,1]; got k1=$k1 b=$b")
    val terms = query.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")
    val toks = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    // query-term filter BEFORE the tf shuffle: only matching tokens move
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // the one-row corpus-stats frame attaches via broadcast: the plan is
    // a nested-loop join whose build side is a single scalar-aggregate
    // row — O(corpus) work, the correct shape (PlanSpec pins the build
    // side to exactly one row; a constant-key equi-join folds back to
    // the same plan after Catalyst removes the trivially-true condition)
    tf.join(dfreq, "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(idCol).agg(round(sum("w"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /**
   * Reciprocal-rank fusion (Cormack et al., SIGIR'09 — the standard
   * hybrid-retrieval combiner, e.g. lexical BM25 ∪ dense ANN in every
   * RAG/hard-negative-mining stack): each input ranking contributes
   * `1 / (kRrf + rank)` per document, fused score = the sum across
   * rankings, top-`k` by (score desc, id asc). Rank-based, so the
   * component scores need no calibration — BM25's unbounded scores and
   * cosine's [-1, 1] fuse without normalization, which is the entire
   * point of RRF over score averaging.
   *
   * Scale: the inputs are already per-query top-k frames (tiny relative
   * to the corpus — each retriever did its own pruning); fusion is one
   * union + one hash aggregate over ≤ Σ kᵢ rows, then a bounded sort.
   * Determinism: each contribution is one exact IEEE division and
   * groups sum at most `rankings.size` terms; the order is decided on
   * the score ROUNDED to `roundTo` decimals (ties by id) — the
   * [[bm25TopK]] rule: rank and emitted value can never disagree, so an
   * external engine ordering on the emitted score replays the exact
   * cut. (Distinct two-term reciprocal sums can sit closer together
   * than the rounding quantum — ordering on the unrounded score while
   * emitting the rounded one would let rank and value contradict.)
   */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      kRrf: Int = 60,
      roundTo: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k $k must be positive")
    require(kRrf >= 0, s"kRrf $kRrf must be >= 0")
    val contribs = rankings.map(_.select(col(idCol),
      (lit(1.0) / (lit(kRrf) + col(rankCol))).as("contrib")))
    contribs.reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(round(sum("contrib"), roundTo).as("rrf"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
