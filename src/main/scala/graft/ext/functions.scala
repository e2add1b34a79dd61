package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SparkInternals.{column, expr}

/** Column-API surface for the native ext expressions. */
object functions {

  /** 64-bit order-sensitive document fingerprint (rolling hash). */
  def fingerprint64(c: Column): Column = column(Fingerprint64(expr(c)))

  /** SimHash of a token array (near-dup key; compare via Hamming distance). */
  def simhash64(tokens: Column): Column = column(SimHash64(expr(tokens)))

  /** MinHash signature (array<long>) of a token/shingle array —
   *  array<string>, or array<long> of pre-hashed shingles. */
  def minhashSignature(tokens: Column, numHashes: Int = 64,
      seed: Long = TextHash.DefaultSeed): Column =
    column(MinHashSignature(expr(tokens), numHashes, seed))

  /** Count of `[^\p{L}\p{N}\s]` code points (punctuation/symbols) —
   *  single-pass counting kernel, never rewrites the string. */
  def punctCount(text: Column): Column = column(PunctCount(expr(text)))

  /** `size(split(text, " "))` without materializing the token array. */
  def spaceTokenCount(text: Column): Column = column(SpaceTokenCount(expr(text)))

  /** Number of single-space tokens of `text` found in `stopwords`
   *  (exact byte comparison, zero allocation). */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    column(StopwordHits(expr(text), stopwords))

  /** Sorted distinct hashed word n-gram shingles (array<long>) of a
   *  string column — single-pass, no string allocation. */
  def hashedShingles(text: Column, n: Int,
      seed: Long = TextHash.DefaultSeed): Column =
    column(HashedShingles(expr(text), n, seed))

  /** One hash per n-token window in document order (array<long>,
   *  position i = window starting at token i) — occurrence mining. */
  def positionalGramHashes(text: Column, n: Int,
      seed: Long = TextHash.DefaultSeed): Column =
    column(PositionalGramHashes(expr(text), n, seed))

  /** Intersection size of two ASC-sorted array<string> cols (merge scan). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expr(a), expr(b)))

  /** Cosine similarity (double) of two array<float> / array<double> cols. */
  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expr(a), expr(b)))

  /** Symmetric int8 scalar-quantization codes (binary) of an embedding
   *  column — 4× smaller than float32, scales cancel in [[int8Cosine]]. */
  def int8Codes(v: Column): Column = column(Int8Codes(expr(v)))

  /** Cosine similarity of two [[int8Codes]] columns (pure integer kernel). */
  def int8Cosine(a: Column, b: Column): Column =
    column(Int8Cosine(expr(a), expr(b)))

  /** Random-hyperplane LSH bucket id for an array<float> embedding. */
  def hyperplaneBucket(v: Column, planes: Int = 16,
      seed: Long = TextHash.DefaultSeed): Column =
    column(HyperplaneBucket(expr(v), planes, seed))

  /** `nProbe` nearest IVF centroid indices for an array<float> embedding. */
  def nearestLists(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    column(NearestLists(expr(v), centroids, nProbe))

  /** Residual PQ codes (binary, one byte per subspace) for an embedding
   *  assigned to coarse list `list` — the IVF-PQ storage kernel. */
  def pqEncode(v: Column, list: Column, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expr(v), expr(list), cents, books))

  /** Per-(query, probed list) ADC lookup table (array<double>). */
  def pqLut(v: Column, list: Column, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Column =
    column(PqLut(expr(v), expr(list), cents, books))

  /** Approximate inner product: [[pqLut]] table vs [[pqEncode]] codes,
   *  O(M) lookups per candidate. */
  def pqAdc(lut: Column, codes: Column): Column =
    column(PqAdc(expr(lut), expr(codes)))

  /** Byte-level BPE tokenization against an exported merges list
   *  (GPT-2-family tokenizer inference): array of piece ids — base
   *  bytes 0–255, merge i yielding id 256+i — in one map-side codegen'd
   *  pass per document; nothing is ever out-of-vocabulary. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "empty BPE merges list")
    column(BpeEncode(expr(text), merges))
  }

  /** [[bpeEncode]] with the merges as piece-ID pairs — the lossless
   *  form [[BpeTrain.train]] learns (byte-exact even for pieces that
   *  are not valid UTF-8, where the string export cannot go). */
  def bpeEncodeIds(text: Column, merges: Seq[(Int, Int)]): Column = {
    require(merges.nonEmpty, "empty BPE merges list")
    column(BpeEncodeIds(expr(text), merges))
  }

  /** A string's UTF-8 bytes as base BPE piece ids 0–255 — the
   *  byte-level starting state of BPE training ([[BpeTrain]]). */
  def utf8Bytes(text: Column): Column = column(Utf8Bytes(expr(text)))

  /** One BPE training round's merge rewrite: every left-to-right
   *  non-overlapping `(left, right)` adjacency in the piece-id array
   *  becomes `mergedId` ([[BpeTrain]]'s distributed loop body). */
  def bpeApplyMerge(ids: Column, left: Int, right: Int, mergedId: Int): Column =
    column(BpeApplyMerge(expr(ids), left, right, mergedId))

  /** Σ weight(token) of a document against an exported vocabulary model
   *  (token → weight): the map-side linear-classifier inference kernel.
   *  The vocabulary ships as sorted hash/weight arrays embedded in the
   *  expression — O(log V) per token, no join, no shuffle. */
  def tokenWeightSum(text: Column, model: Map[String, Double],
      seed: Long = TextHash.DefaultSeed): Column = {
    require(model.nonEmpty, "empty model vocabulary")
    val entries = model.toArray.map { case (tok, w) =>
      val b = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed), w)
    }.sortBy(_._1)
    require(entries.map(_._1).distinct.length == entries.length,
      "hash collision inside the model vocabulary — change the seed")
    column(TokenWeightSum(expr(text), entries.map(_._1), entries.map(_._2), seed))
  }

  /** Approximate `count(DISTINCT x)` with k-bounded state (KMV sketch);
   *  exact while the group's distinct count stays under `k`. */
  def kmvDistinct(c: Column, k: Int = 4096): Column =
    column(KmvDistinct(expr(c), k).toAggregateExpression())

  /** Top `k` most frequent values as array<struct<item,cnt,err>> with
   *  capacity-bounded state (SpaceSaving sketch); exact (err=0) while
   *  the group's distinct count stays under `capacity`. */
  def approxTopItems(c: Column, capacity: Int = 4096, k: Int = 10): Column =
    column(ApproxTopItems(expr(c), capacity, k).toAggregateExpression())

  /** The [[kmvDistinct]] sketch as a persistable BINARY state — the
   *  store step of incremental profiling; extend with [[kmvMerge]] /
   *  [[kmvMergeState]] instead of rescanning history. Canonical bytes:
   *  a pure function of the input set, independent of partitioning. */
  def kmvState(c: Column, k: Int = 4096): Column =
    column(KmvState(expr(c), k).toAggregateExpression())

  /** Union stored [[kmvState]] buffers into the distinct-count estimate
   *  (exact while the union holds < k hashes) — the serve step. */
  def kmvMerge(state: Column, k: Int = 4096): Column =
    column(KmvMergeDistinct(expr(state), k).toAggregateExpression())

  /** Union stored [[kmvState]] buffers into a NEW state — the rollup
   *  step (day → month → total) of a sketch cube. */
  def kmvMergeState(state: Column, k: Int = 4096): Column =
    column(KmvMergeState(expr(state), k).toAggregateExpression())

  /** The [[approxTopItems]] summary as a persistable BINARY state;
   *  extend/serve with [[topItemsMerge]]. Exact while every
   *  contributing group's distinct-item count fits `capacity`. */
  def topItemsState(c: Column, capacity: Int = 4096): Column =
    column(TopItemsState(expr(c), capacity).toAggregateExpression())

  /** Merge stored [[topItemsState]] summaries, emitting the top `k`
   *  items in [[approxTopItems]]'s output shape. */
  def topItemsMerge(state: Column, capacity: Int = 4096, k: Int = 10): Column =
    column(TopItemsMerge(expr(state), capacity, k).toAggregateExpression())

  /** q-quantile of a numeric column with k-bounded mergeable state (KLL
   *  sketch); equals `percentile_disc(q)` while the group holds ≤ k
   *  values. The 100 TB face of percentile aggregation — Spark's exact
   *  percentile buffers every value per group. */
  def quantileSketch(c: Column, q: Double, k: Int = 4096): Column =
    column(QuantileSketchAgg(expr(c), k, q).toAggregateExpression())

  /** Several quantiles of one column from ONE sketch (array<double>,
   *  positionally aligned with `qs`) — the profiling shape pays one
   *  buffer and one sweep instead of one aggregate per probability. */
  def quantileSketchMulti(c: Column, qs: Seq[Double], k: Int = 4096): Column =
    column(QuantileSketchMultiAgg(expr(c), k, qs).toAggregateExpression())

  /** [[quantileSketchMulti]] over STORED [[quantileState]] buffers. */
  def quantileMergeMulti(state: Column, qs: Seq[Double], k: Int = 4096): Column =
    column(QuantileMergeMulti(expr(state), k, qs).toAggregateExpression())

  /** The [[quantileSketch]] sketch as a persistable BINARY state — the
   *  store step; canonical bytes while the group stays ≤ k values. */
  def quantileState(c: Column, k: Int = 4096): Column =
    column(QuantileState(expr(c), k).toAggregateExpression())

  /** Union stored [[quantileState]] buffers into a quantile — the serve
   *  step of incremental profiling. */
  def quantileMerge(state: Column, q: Double, k: Int = 4096): Column =
    column(QuantileMergeQuantile(expr(state), k, q).toAggregateExpression())

  /** Union stored [[quantileState]] buffers into a NEW state — the
   *  rollup step (day → month → total) of a sketch cube. */
  def quantileMergeState(state: Column, k: Int = 4096): Column =
    column(QuantileMergeState(expr(state), k).toAggregateExpression())
}
