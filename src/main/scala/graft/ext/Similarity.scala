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

  /**
   * Joint (planes, seeds) sizing for the hyperplane-LSH operators — the
   * AND-OR amplification recipe (Indyk–Motwani; MMDS ch.3 LSH families):
   *
   *  - `planes` bounds BUCKET OCCUPANCY: expected rows per bucket is
   *    ~`corpusRows / 2^planes`, so planes = ⌈log₂(n / targetBucketRows)⌉
   *    keeps the per-bucket self-join linear in n. A fixed plane count is
   *    the scale trap: 8 planes = 256 buckets regardless of corpus size,
   *    so at 10⁹ rows a bucket holds ~4M vectors and the bucket join goes
   *    quadratic.
   *  - raising planes LOWERS RECALL: two vectors at angle θ collide under
   *    one seed with probability (1 − θ/π)^planes. `seeds` restores it:
   *    s independent seeds give recall 1 − (1 − q)^s, so
   *    s = ⌈ln(1 − targetRecall) / ln(1 − q)⌉ at the design similarity
   *    `minCos`.
   *
   * Pure arithmetic — callers pass a corpus-row estimate (`df.count()`
   * on a parquet-backed corpus is metadata-cheap, or reuse a known
   * table row count). planes clamps to [8, 30] (2³⁰ buckets ≫ any
   * realistic executor count), seeds to [1, 64] (past that, the corpus
   * duplication cost says use more planes or a tighter design point).
   * Seed values derive deterministically from `baseSeed`, so a re-run
   * — or a different cluster — buckets identically.
   */
  /** Multi-seed hyperplane bucketing in ONE pass: appends (seed, bucket)
   *  columns, one output row per (input row, seed) via a map-side
   *  explode. The alternative — a per-seed union — rescans the input
   *  once per seed, and auto-sized seed counts reach 64: at 100 TB that
   *  is 64 corpus scans for one bucketing step. Same output rows, same
   *  downstream shuffles; only the scan count changes. */
  private[ext] def seedBucketed(
      df: DataFrame, vecCol: String, planes: Int, seeds: Seq[Long]): DataFrame = {
    val sb = seeds.map(s => struct(lit(s).as("seed"),
      functions.hyperplaneBucket(col(vecCol), planes, s).as("bucket")))
    df.withColumn("__sb", explode(array(sb: _*)))
      .withColumn("seed", col("__sb.seed"))
      .withColumn("bucket", col("__sb.bucket"))
      .drop("__sb")
  }

  def autoLshParams(
      corpusRows: Long,
      targetBucketRows: Long = 1024,
      minCos: Double = 0.95,
      targetRecall: Double = 0.90,
      baseSeed: Long = TextHash.DefaultSeed): (Int, Seq[Long]) = {
    require(corpusRows >= 0, s"corpusRows $corpusRows must be >= 0")
    require(targetBucketRows >= 1, s"targetBucketRows $targetBucketRows must be >= 1")
    require(minCos > -1.0 && minCos < 1.0, s"minCos $minCos must be in (-1, 1)")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall $targetRecall must be in (0, 1)")
    val forBuckets =
      if (corpusRows <= targetBucketRows) 1
      else math.ceil(math.log(corpusRows.toDouble / targetBucketRows) / math.log(2.0)).toInt
    val planes = math.min(30, math.max(8, forBuckets))
    // per-seed collision probability at the design similarity
    val q = math.pow(1.0 - math.acos(minCos) / math.Pi, planes)
    val s =
      if (q <= 0.0) 64
      else if (q >= 1.0) 1
      else math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - q)).toInt
    val nSeeds = math.min(64, math.max(1, s))
    val seeds = Seq.tabulate(nSeeds)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, baseSeed))
    (planes, seeds)
  }

  /** [[lshTopK]] with (planes, seeds) auto-sized from the corpus row
   *  count via [[autoLshParams]] — the 10⁹-row-safe entry point. One
   *  `count()` action (metadata-cheap over parquet scans). */
  def lshTopKAuto(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      targetBucketRows: Long = 1024,
      designCos: Double = 0.90,
      targetRecall: Double = 0.90): DataFrame = {
    val (planes, seeds) =
      autoLshParams(corpus.count(), targetBucketRows, designCos, targetRecall)
    lshTopK(corpus, probes, idCol, vecCol, k, planes, seeds)
  }

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
    rankTopK(
      c.crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec"))),
      "cos", k)
  }

  /**
   * Hard-negative mining for contrastive training — the DPR /
   * sentence-transformers data-prep step (Karpukhin et al. 2020,
   * "Dense passage retrieval for open-domain question answering"):
   * for each (query, positive) pair, the top-`k` corpus vectors most
   * similar to the QUERY excluding the query itself and its positive —
   * the negatives a bi-encoder most confuses, which is exactly what
   * makes them worth training on. Exclusion applies BEFORE ranking, so
   * a positive can never displace a real negative out of the top-k.
   *
   * Scale: the pair batch broadcasts against the corpus (mining batches
   * are small relative to the corpus — the q22 small-probe shape), with
   * each query's positive SET riding the same broadcast row. Positives
   * are aggregated per query before the crossJoin — ranking partitions
   * by q_id alone, so a per-(q_id, pos_id) row shape would both emit a
   * query's other positives as "negatives" and duplicate every
   * candidate once per pair. Membership in the (small) per-query set
   * costs an array probe, not a join. For corpus-×-corpus mining, feed
   * IVF-probed candidates ([[ivfProbe]]) through the same exclusion +
   * rank — hard negatives need recall, not exactness.
   */
  def hardNegatives(
      corpus: DataFrame,
      pairs: DataFrame, // (q_id, pos_id)
      idCol: String,
      vecCol: String,
      k: Int = 5): DataFrame = {
    val posSets = pairs.groupBy(col("q_id"))
      .agg(collect_set(col("pos_id")).as("pos_ids"))
    val q = corpus.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .join(posSets, "q_id")
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    rankTopK(
      c.crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id") &&
          !array_contains(col("pos_ids"), col("n_id")))
        .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec"))),
      "cos", k)
  }

  /**
   * [[bruteForceTopK]] over int8 scalar-quantized codes (SQ8): both
   * sides quantize map-side ([[functions.int8Codes]], 4× smaller than
   * float32 — at 10⁹×1 KB vectors that is the difference between a
   * corpus that fits executor memory and one that spills), and scoring
   * is the pure integer [[functions.int8Cosine]] kernel (per-vector
   * scales cancel in the cosine, so no scale column travels). Ranking
   * error vs exact cosine is bounded by the quantization step (~1/127
   * per component); identical vectors still score exactly 1.0. The
   * quantize-once/probe-many pattern: persist the codes column next to
   * the corpus and amortize quantization across every query.
   */
  def quantizedTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
      functions.int8Codes(col(vecCol)).as("n_codes"))
    val q = probes.select(col(idCol).as("q_id"),
      functions.int8Codes(col(vecCol)).as("q_codes"))
    rankTopK(
      c.crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("qcos", functions.int8Cosine(col("q_codes"), col("n_codes"))),
      "qcos", k)
  }

  /** Approximate top-k: candidates from multi-probe hyperplane-LSH bucket
   *  collisions, exact cosine re-rank. Both sides shuffle on (seed,
   *  bucket) — scale-safe for corpus-sized probe sets too.
   *
   *  100 TB sizing: the 8-plane default is FIXED-CARDINALITY (256
   *  buckets per seed) — right for ≲10⁶-row corpora; beyond that the
   *  per-bucket join grows quadratically in corpus size. Size planes to
   *  ⌈log₂(n / targetBucketRows)⌉ and compensate recall with more seeds
   *  ([[autoLshParams]] computes the pair jointly; [[lshTopKAuto]] wires
   *  it in). */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      planes: Int = 8,
      seeds: Seq[Long] = Seq(42L, 4242L, 424242L),
      materialize: Boolean = true): DataFrame = {
    // ONE corpus scan for ALL seeds: the projected corpus materializes
    // once, each seed's bucketing pass reads cached blocks (a per-seed
    // union over the raw input rescans the corpus per seed — auto
    // sizing reaches 64). Blocks release once the — much smaller —
    // candidate ranking materializes; materialize=false keeps the
    // pipeline lazy for plan inspection.
    def ckpt(d: DataFrame): DataFrame = if (materialize) d.localCheckpoint() else d
    val cBase = ckpt(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")))
    val qBase = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // exact cosine is computed INSIDE the bucket join (the r10 pair-miner
    // shuffle discipline): the candidate list — the only super-linear
    // volume here — streams straight from the join into the scoring
    // projection without ever being shuffled; what shuffles is the keyed
    // corpus/probe rows (linear, vector aboard) and then the scored
    // survivors once for the cross-seed dedup + ranking. Round 9's
    // id-only-candidates form shuffled the candidate list three times
    // (distinct + two vector re-joins) and measured exp 1.7 at the 100×
    // stress; vectors-through-the-CANDIDATE-shuffle (the r8 OOM shape)
    // remains wrong — the candidates never shuffle at all now.
    def keyed(base: DataFrame, id: String, vec: String) =
      seeds.map { s =>
        base.select(col(id), col(vec), lit(s).as("seed"),
          functions.hyperplaneBucket(col(vec), planes, s).as("bucket"))
      }.reduce(_ unionByName _)
    val c = keyed(cBase, "n_id", "n_vec")
    val q = keyed(qBase, "q_id", "q_vec")
    val scored = q.join(c,
        q("seed") === c("seed") && q("bucket") === c("bucket") &&
          col("q_id") =!= col("n_id"))
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec")))
      .select(col("q_id"), col("n_id"), col("cos"))
      // cosine is deterministic per pair: cross-seed duplicates are
      // exact-row duplicates, deduped before ranking so a pair cannot
      // occupy two top-k slots
      .distinct()
    val out = rankTopK(scored, "cos", k)
    if (!materialize) return out
    val result = out.localCheckpoint() // eager: pins the (small) top-k …
    graft.ext.Dedup.release(cBase) // … so the projected corpus drops NOW
    result
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
  /**
   * Persistable IVF-Flat index: `centroids` (list, centroid) is
   * nlist-bounded and tiny; `assigned` (list, n_id, n_vec) is the
   * corpus in inverted-list order. Both are plain frames — store them
   * (e.g. in snapshot tables) and probe forever without retraining:
   * the serving pattern, where one expensive [[ivfBuild]] amortizes
   * over every later [[ivfProbe]] and [[ivfAssign]] grows the index
   * with new batches under the FIXED quantizer (standard IVF practice;
   * rebuild when drift accumulates).
   */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Train the quantizer and assign the corpus — one pass, map-side
   *  assignment ([[ivfTopK]]'s machinery, reified as storable frames). */
  def ivfBuild(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000): IvfIndex = {
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters, sampleN)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("list", "centroid")
    IvfIndex(centDf, ivfAssign(centDf, corpus, idCol, vecCol))
  }

  /** Assign a batch to the index's inverted lists (map-side, the
   *  incremental-add path): rows to append to `assigned`. */
  def ivfAssign(
      centroids: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val cents = collectCentroids(centroids)
    batch.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("list",
        element_at(functions.nearestLists(col("n_vec"), cents, 1), 1))
      .select(col("list"), col("n_id"), col("n_vec"))
  }

  /** Top-k over a stored index — [[ivfTopK]] semantics without the
   *  training step. The centroid frame is collected (nlist-bounded,
   *  the one driver row set of the IVF family). */
  def ivfProbe(
      index: IvfIndex,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(index.centroids)
    val c = index.assigned
    val q = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("list",
        explode(functions.nearestLists(col("q_vec"), cents, math.min(nProbe, cents.length))))
    val candidates = q.join(c, q("list") === c("list") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
    rankTopK(candidates
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec"))),
      "cos", k)
  }

  /**
   * Per-probe top-k rank over a scored candidate frame — the shared
   * tail of every top-k searcher in this file. q84's exactness contract
   * (IVF-SQ8 exhaustive ≡ brute-force SQ8) depends on the window order
   * and self-pair handling staying byte-identical across variants, so
   * they share this one definition.
   */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col(scoreCol).desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col(scoreCol), col("rank"))
  }

  // ------------------------------------------------------- IVF as tables

  /** Persisted IVF-Flat index: the [[IvfIndex]] frames as snapshot
   *  tables — `centroids` nlist-bounded and tiny, `assigned`
   *  range-clustered and manifest-bloomed on `list` so a probe reads
   *  ONLY the probed lists' files ([[ivfProbeIndexed]]). Both tables pin
   *  the quantizer they were built under (`graft.ivf.fingerprint`, a
   *  content hash of the centroid matrix in list order, plus nlist/dim):
   *  rows ASSIGNED under one quantizer SERVED under another silently
   *  destroy recall — the probe walks the wrong lists and finds
   *  nothing wrong-looking — which is the exact failure mode the
   *  minhash geometry pins close for the text indexes
   *  ([[Dedup.buildMinhashIndexTables]]). */
  final case class IvfIndexTables(
      centroids: graft.tables.SnapshotTable,
      assigned: graft.tables.SnapshotTable)

  /** Content hash of the centroid matrix (list order, exact float
   *  bits — FNV-1a over `floatToIntBits`): [[trainCentroids]] is
   *  deterministic, so equal builds fingerprint equal, and any drift in
   *  sample, nlist, iters, or corpus changes the pin. */
  def centroidFingerprint(cents: Array[Array[Float]]): String = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var j = 0
      while (j < c.length) {
        h = (h ^ java.lang.Float.floatToIntBits(c(j))) * 0x100000001B3L
        j += 1
      }
      h = (h ^ i) * 0x100000001B3L // list boundaries matter, not just values
      i += 1
    }
    f"$h%016x"
  }

  private def ivfGeometryProps(cents: Array[Array[Float]]): Map[String, String] =
    Map("graft.ivf.fingerprint" -> centroidFingerprint(cents),
      "graft.ivf.nlist" -> cents.length.toString,
      "graft.ivf.dim" -> cents.headOption.map(_.length).getOrElse(0).toString)

  /** Persist one (centroids, assigned) pair as pinned tables — shared
   *  by the Flat and SQ8 lifecycles, so the two cannot drift on the
   *  pinning/clustering discipline. */
  private def persistIvfTables(
      spark: org.apache.spark.sql.SparkSession,
      centRoot: String,
      asgRoot: String,
      centDf: DataFrame,
      assigned: DataFrame,
      filesPerTable: Int,
      extraProps: Map[String, String] = Map.empty): (graft.tables.SnapshotTable, graft.tables.SnapshotTable) = {
    val props = ivfGeometryProps(collectCentroids(centDf)) ++ extraProps
    val cent = graft.tables.SnapshotTable.create(spark, centRoot, centDf)
      .setProperties(props)
    // seed commit carries the bloom config so the data overwrite below
    // builds per-file blooms (the buildMinhashIndexTables pattern)
    val asg = graft.tables.SnapshotTable.create(spark, asgRoot, assigned.limit(1))
      .setProperties(props ++ Map(
        "graft.bloom.columns" -> "list",
        "graft.bloom.manifest" -> "true"))
    // file count scales with rows so per-file blooms never saturate
    // under the manifest cap (FileBloom.bloomSizedFiles)
    asg.overwriteClustered(assigned, Seq("list"),
      graft.tables.FileBloom.bloomSizedFiles(filesPerTable, assigned.count()))
    (cent, asg)
  }

  /** Build the persisted form of [[ivfBuild]]: centroid table (tiny) +
   *  assigned table range-clustered on `list` with per-file manifest
   *  blooms, both pinned with the quantizer fingerprint. One training +
   *  one assignment pass; everything after is [[ivfAppendTo]] /
   *  [[ivfProbeIndexed]] against the stored state. */
  def buildIvfIndexTables(
      spark: org.apache.spark.sql.SparkSession,
      centRoot: String,
      asgRoot: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000,
      filesPerTable: Int = 16): IvfIndexTables = {
    val idx = ivfBuild(corpus, idCol, vecCol, nlist, iters, sampleN)
    val (cent, asg) = persistIvfTables(spark, centRoot, asgRoot,
      idx.centroids, idx.assigned, filesPerTable)
    IvfIndexTables(cent, asg)
  }

  /** Refuse a centroid/assignment quantizer mismatch. Two checks, both
   *  conservative (unpinned tables pass): the two tables' build
   *  fingerprints must agree — an assigned table built or appended
   *  under a different quantizer than the centroid table's is exactly
   *  the silent-recall-loss pairing — and the centroid table's CURRENT
   *  rows must still hash to its own pin, so a mutated or mispaired
   *  centroid table fails loudly instead of routing probes to the
   *  wrong lists. Cost: one nlist-row read. */
  def checkIvfGeometry(tables: IvfIndexTables): Unit =
    checkIvfGeometry(tables.centroids, tables.assigned)

  private def checkIvfGeometry(
      centroids: graft.tables.SnapshotTable,
      assigned: graft.tables.SnapshotTable): Unit = {
    val cp = centroids.properties().get("graft.ivf.fingerprint")
    val ap = assigned.properties().get("graft.ivf.fingerprint")
    for (c <- cp; a <- ap) require(c == a,
      s"IVF tables disagree on their build quantizer: centroids ${centroids.root} " +
        s"pin $c, assignments ${assigned.root} pin $a — rows assigned under one " +
        "quantizer cannot be served under another")
    cp.foreach { pin =>
      val now = centroidFingerprint(collectCentroids(centroids.read()))
      require(now == pin,
        s"centroid table ${centroids.root} no longer matches its build " +
          s"fingerprint ($pin -> $now); rebuild the index")
    }
  }

  /** The probed lists' files of a pinned assigned table: the union of
   *  the probes' nProbe-nearest list ids (≤ nlist values, the IVF
   *  family's one accepted driver row set) key-probes the manifest —
   *  range stats + per-file blooms on `list`. Conservative file
   *  skipping only; the raw read refuses DV/delta/column-mapping
   *  overlays loudly ([[graft.tables.SnapshotTable.keyProbedRead]]). */
  private def prunedAssignedRead(
      assigned: graft.tables.SnapshotTable,
      probes: DataFrame,
      vecCol: String,
      cents: Array[Array[Float]],
      nProbe: Int): DataFrame = {
    val lists = probes
      .select(explode(functions.nearestLists(col(vecCol), cents,
        math.min(nProbe, cents.length))).as("list"))
      .distinct().collect().map(_.get(0)).toSeq
    assigned.keyProbedRead("list", lists)
  }

  /** Grow the persisted index with a new batch under the FIXED stored
   *  quantizer (standard IVF practice — rebuild when drift
   *  accumulates): assignment is map-side against the table's OWN
   *  centroids, so this path cannot mix quantizers by construction;
   *  appended files are range-sorted on `list` to keep tight per-file
   *  stats (per-file blooms make appends non-degrading — the minhash
   *  index-table append contract). */
  def ivfAppendTo(
      tables: IvfIndexTables,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      batchFiles: Int = 4,
      action: String = "append"): Unit = {
    checkIvfGeometry(tables)
    val fresh = ivfAssign(tables.centroids.read(), batch, idCol, vecCol)
    // `action` lets a streaming caller tag the commit (`stream-<batchId>`)
    // so re-delivered micro-batches stay idempotent (StreamIngest.ivfIngestSink)
    tables.assigned.appendAs(fresh.repartitionByRange(batchFiles, col("list")), action)
    ()
  }

  /** Maintenance pass for a persisted IVF index: full clustered rewrite
   *  of the assigned table on `list`
   *  ([[graft.tables.SnapshotTable.recluster]]) — a long run of
   *  [[ivfAppendTo]] / streaming batches leaves each probed list
   *  scattered across one small file per append, so the key-probed
   *  serve's file count (and task count) grows with ingest history even
   *  though pruning stays exact; reclustering restores one-file-per-
   *  list-range, rebuilds per-file and manifest blooms, and carries the
   *  quantizer fingerprint pins forward. Concurrent appends rebase on
   *  top via the disjoint-file rule. Returns files rewritten. */
  def ivfCompactIndex(tables: IvfIndexTables, filesPerTable: Int = 16): Int = {
    checkIvfGeometry(tables)
    tables.assigned.recluster(Seq("list"),
      graft.tables.FileBloom.bloomSizedFiles(filesPerTable,
        tables.assigned.manifestEntries().map(_.rows).filter(_ > 0).sum))
  }

  /** [[ivfProbe]] served from the PERSISTED tables with file pruning:
   *  the union of the probes' nProbe-nearest list ids (≤ nlist values,
   *  the IVF family's one accepted driver row set) key-probes the
   *  assigned table's manifest — range stats plus per-file blooms on
   *  `list` — so each call reads ~nProbe/nlist of the index files
   *  instead of streaming the whole assignment table through the join.
   *  Pruning is conservative file skipping only, so the result is
   *  EXACTLY [[ivfProbe]] over the full table (spec-pinned); with
   *  `nProbe = nlist` it is exhaustive and the brute-force oracle
   *  applies. */
  def ivfProbeIndexed(
      tables: IvfIndexTables,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    checkIvfGeometry(tables)
    val centDf = tables.centroids.read()
    // probes are small by the family's contract (bruteForceTopK
    // broadcasts them), so computing their list ids twice — once for the
    // prune, once inside the delegated probe — is cheaper than a
    // checkpoint's persisted blocks. Delegation makes the exactness
    // claim structural: the pruned serve IS ivfProbe over fewer files.
    val assigned = prunedAssignedRead(tables.assigned, probes, vecCol,
      collectCentroids(centDf), nProbe)
    ivfProbe(IvfIndex(centDf, assigned), probes, idCol, vecCol, k, nProbe)
  }

  /** [[IvfIndexTables]] for the SQ8 index — same pinned-table
   *  discipline, inverted lists storing int8 codes (4× smaller stored
   *  index, [[IvfIndexSq8]]'s trade). */
  final case class IvfIndexTablesSq8(
      centroids: graft.tables.SnapshotTable,
      assigned: graft.tables.SnapshotTable)

  /** [[buildIvfIndexTables]] for the SQ8 index. */
  def buildIvfIndexTablesSq8(
      spark: org.apache.spark.sql.SparkSession,
      centRoot: String,
      asgRoot: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000,
      filesPerTable: Int = 16): IvfIndexTablesSq8 = {
    val idx = ivfBuildQuantized(corpus, idCol, vecCol, nlist, iters, sampleN)
    val (cent, asg) = persistIvfTables(spark, centRoot, asgRoot,
      idx.centroids, idx.assigned, filesPerTable)
    IvfIndexTablesSq8(cent, asg)
  }

  /** [[ivfAppendTo]] for the SQ8 index: assignment + int8 coding both
   *  map-side against the stored quantizer. */
  def ivfAppendToSq8(
      tables: IvfIndexTablesSq8,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      batchFiles: Int = 4): Unit = {
    checkIvfGeometry(tables.centroids, tables.assigned)
    val fresh = ivfAssignQuantized(tables.centroids.read(), batch, idCol, vecCol)
    tables.assigned.append(fresh.repartitionByRange(batchFiles, col("list")))
    ()
  }

  /** [[ivfProbeIndexed]] for the SQ8 index — delegates to
   *  [[ivfProbeQuantized]] over the probed lists' files, so exactness
   *  vs the unpruned quantized probe is structural. */
  def ivfProbeIndexedSq8(
      tables: IvfIndexTablesSq8,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    checkIvfGeometry(tables.centroids, tables.assigned)
    val centDf = tables.centroids.read()
    val assigned = prunedAssignedRead(tables.assigned, probes, vecCol,
      collectCentroids(centDf), nProbe)
    ivfProbeQuantized(IvfIndexSq8(centDf, assigned), probes, idCol, vecCol, k, nProbe)
  }

  /** [[IvfIndexTables]] for the PQ index — three tables (codebooks join
   *  the pair), pinned with BOTH the centroid fingerprint and a
   *  codebook fingerprint: a drifted or mispaired codebook silently
   *  MIS-DECODES every stored code (ADC scores against the wrong
   *  reconstruction), the PQ-specific analogue of the wrong-lists
   *  hazard. */
  final case class IvfIndexTablesPq(
      centroids: graft.tables.SnapshotTable,
      codebooks: graft.tables.SnapshotTable,
      assigned: graft.tables.SnapshotTable)

  /** Content hash of the residual codebooks ((sub, code) order, exact
   *  float bits) — [[centroidFingerprint]]'s discipline for the second
   *  quantizer PQ carries. */
  def bookFingerprint(books: Array[Array[Array[Float]]]): String = {
    var h = 0xCBF29CE484222325L
    var mi = 0
    while (mi < books.length) {
      var j = 0
      while (j < books(mi).length) {
        val e = books(mi)(j)
        var x = 0
        while (x < e.length) {
          h = (h ^ java.lang.Float.floatToIntBits(e(x))) * 0x100000001B3L
          x += 1
        }
        j += 1
      }
      h = (h ^ mi) * 0x100000001B3L
      mi += 1
    }
    f"$h%016x"
  }

  private val PqPinKey = "graft.ivf.pq.fingerprint"

  /** [[buildIvfIndexTables]] for the PQ index: centroid + codebook
   *  tables (both driver-tiny) and the `list`-clustered code table, all
   *  three pinned with both quantizer fingerprints. */
  def buildIvfIndexTablesPq(
      spark: org.apache.spark.sql.SparkSession,
      centRoot: String,
      bookRoot: String,
      asgRoot: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000,
      filesPerTable: Int = 16): IvfIndexTablesPq = {
    val idx = ivfBuildPq(corpus, idCol, vecCol, nlist, m, ksub, iters, sampleN)
    val pqPin = Map(PqPinKey -> bookFingerprint(collectBooks(idx.codebooks)))
    val (cent, asg) = persistIvfTables(spark, centRoot, asgRoot,
      idx.centroids, idx.assigned, filesPerTable, extraProps = pqPin)
    val books = graft.tables.SnapshotTable.create(spark, bookRoot, idx.codebooks)
      .setProperties(ivfGeometryProps(collectCentroids(idx.centroids)) ++ pqPin)
    IvfIndexTablesPq(cent, books, asg)
  }

  /** Both quantizer checks for the PQ tables: the Flat-side pair +
   *  centroid self-pin, the PQ fingerprint agreeing across all three
   *  tables, and the codebook table's CURRENT rows hashing to its own
   *  pin. Unpinned tables pass, as everywhere. */
  def checkIvfGeometryPq(tables: IvfIndexTablesPq): Unit = {
    checkIvfGeometry(tables.centroids, tables.assigned)
    val pins = Seq(tables.centroids, tables.codebooks, tables.assigned)
      .flatMap(t => t.properties().get(PqPinKey).map(t.root -> _))
    require(pins.map(_._2).distinct.size <= 1,
      s"IVF-PQ tables disagree on their codebook fingerprint: " +
        pins.map { case (r, p) => s"$r=$p" }.mkString(", "))
    tables.codebooks.properties().get(PqPinKey).foreach { pin =>
      val now = bookFingerprint(collectBooks(tables.codebooks.read()))
      require(now == pin,
        s"codebook table ${tables.codebooks.root} no longer matches its build " +
          s"fingerprint ($pin -> $now); stored codes would mis-decode — rebuild")
    }
  }

  /** [[ivfAppendTo]] for the PQ index: assignment + residual PQ coding
   *  both map-side under the STORED quantizers. */
  def ivfAppendToPq(
      tables: IvfIndexTablesPq,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      batchFiles: Int = 4): Unit = {
    checkIvfGeometryPq(tables)
    val fresh = ivfAssignPq(tables.centroids.read(), tables.codebooks.read(),
      batch, idCol, vecCol)
    tables.assigned.append(fresh.repartitionByRange(batchFiles, col("list")))
    ()
  }

  /** [[ivfProbeIndexed]] for the PQ index — ADC probe delegated to
   *  [[ivfProbePq]] over the probed lists' files. */
  def ivfProbeIndexedPq(
      tables: IvfIndexTablesPq,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    checkIvfGeometryPq(tables)
    val centDf = tables.centroids.read()
    val assigned = prunedAssignedRead(tables.assigned, probes, vecCol,
      collectCentroids(centDf), nProbe)
    ivfProbePq(IvfIndexPq(centDf, tables.codebooks.read(), assigned),
      probes, idCol, vecCol, k, nProbe)
  }

  /** [[ivfProbePqRefined]] from the persisted tables: ADC winnows over
   *  the probed lists' files, then only the `refine` survivors fetch
   *  full vectors from `corpus` for the exact re-rank — the
   *  billion-scale serving shape end-to-end from cold storage. */
  def ivfProbeIndexedPqRefined(
      tables: IvfIndexTablesPq,
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4,
      refine: Int = 50): DataFrame = {
    checkIvfGeometryPq(tables)
    val centDf = tables.centroids.read()
    val assigned = prunedAssignedRead(tables.assigned, probes, vecCol,
      collectCentroids(centDf), nProbe)
    ivfProbePqRefined(IvfIndexPq(centDf, tables.codebooks.read(), assigned),
      corpus, probes, idCol, vecCol, k, nProbe, refine)
  }

  /**
   * Persistable IVF-SQ8 index: like [[IvfIndex]] but the inverted lists
   * store int8 codes (`list`, `n_id`, `n_codes`) — 4× smaller than the
   * float payload. Its OWN type because the frames are not
   * interchangeable with [[IvfIndex]]'s: [[ivfProbe]]/[[ivfAssign]]
   * expect `n_vec`, this index's consumers are [[ivfProbeQuantized]] /
   * [[ivfAssignQuantized]].
   */
  final case class IvfIndexSq8(centroids: DataFrame, assigned: DataFrame)

  /**
   * IVF-SQ8 build: [[ivfBuild]] with the inverted lists storing int8
   * codes ([[functions.int8Codes]]) instead of float vectors — the
   * standard FAISS production trade (IVF coarse quantizer kept in
   * float, list payload scalar-quantized): the STORED index shrinks 4×,
   * which at 10⁹×1 KB vectors is what lets the lists live in executor
   * memory instead of spilling. Probe with [[ivfProbeQuantized]];
   * re-ranking is the pure-integer [[functions.int8Cosine]] kernel
   * (scales cancel), so with `nProbe = nlist` the result is EXACTLY the
   * brute-force SQ8 ranking ([[quantizedTopK]]) — same oracle applies.
   */
  def ivfBuildQuantized(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000): IvfIndexSq8 = {
    val full = ivfBuild(corpus, idCol, vecCol, nlist, iters, sampleN)
    IvfIndexSq8(full.centroids, full.assigned
      .withColumn("n_codes", functions.int8Codes(col("n_vec")))
      .select(col("list"), col("n_id"), col("n_codes")))
  }

  /** Assign a batch to a quantized index's lists (map-side — the
   *  incremental-add path, [[ivfAssign]] for [[IvfIndexSq8]]): rows to
   *  append to its `assigned` frame. */
  def ivfAssignQuantized(
      centroids: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    ivfAssign(centroids, batch, idCol, vecCol)
      .withColumn("n_codes", functions.int8Codes(col("n_vec")))
      .select(col("list"), col("n_id"), col("n_codes"))

  /** Top-k over an [[ivfBuildQuantized]] index: probes quantize
   *  map-side, candidates come from the same list equi-join, scoring is
   *  the integer [[functions.int8Cosine]] kernel. Returns
   *  (q_id, n_id, qcos, rank). */
  def ivfProbeQuantized(
      index: IvfIndexSq8,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(index.centroids)
    val c = index.assigned
    val q = probes.select(col(idCol).as("q_id"),
        functions.int8Codes(col(vecCol)).as("q_codes"),
        explode(functions.nearestLists(col(vecCol), cents,
          math.min(nProbe, cents.length))).as("list"))
    rankTopK(
      q.join(c, q("list") === c("list") && col("q_id") =!= col("n_id"))
        .withColumn("qcos", functions.int8Cosine(col("q_codes"), col("n_codes"))),
      "qcos", k)
  }

  /**
   * Trained product-quantizer state: the coarse IVF centroids plus one
   * L2 codebook of `ksub` entries per subspace (M × ksub × d/M floats,
   * driver-tiny). Trained once on a bounded deterministic sample — like
   * FAISS, the quantizer is small even when the corpus is 10⁹ rows.
   */
  final case class PqModel(cents: Array[Array[Float]], books: Array[Array[Array[Float]]])

  /**
   * Persistable IVF-PQ index (FAISS `IndexIVFPQ`, Jégou et al. 2011):
   * `centroids` (list, centroid) and `codebooks` (sub, code, entry) are
   * driver-tiny; `assigned` (list, n_id, n_codes) stores each corpus
   * vector as M unsigned bytes of residual PQ codes — for 64-dim float
   * corpora at M=8 that is a 32× smaller stored index than IVF-Flat
   * (vs 4× for SQ8): the difference between 10⁹ vectors needing 256 GB
   * of list payload and needing 8 GB. All three are plain frames —
   * store them in snapshot tables and probe forever without retraining.
   */
  final case class IvfIndexPq(centroids: DataFrame, codebooks: DataFrame, assigned: DataFrame)

  /**
   * Train the coarse quantizer and the per-subspace residual codebooks
   * (Lloyd k-means under L2, deterministic spread init, fixed
   * iterations — same sample recipe as [[trainCentroids]], so a re-run
   * or a different cluster trains the identical quantizer).
   */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000): PqModel = {
    require(m >= 1, s"m $m must be >= 1")
    require(ksub >= 1 && ksub <= 256, s"ksub $ksub must be in [1, 256] (one byte per code)")
    val cents = trainCentroids(corpus, idCol, vecCol, nlist, iters, sampleN)
    // the residual codebooks train on RAW vectors (PQ approximates the
    // vector itself, not its direction), sampled by the same
    // deterministic smallest-N-by-id-hash recipe
    val sample = corpus.select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
      .filterNot(_.exists(_.isNaN))
    require(sample.nonEmpty, "cannot train PQ codebooks: no finite sampled vectors")
    val d = sample(0).length
    require(d % m == 0, s"dimension $d must divide into m=$m subspaces")
    val dsub = d / m
    // driver replay of the map-side coarse assignment (same ranking as
    // [[VecKernels.nearestLists]]: dot, ties by lower index)
    val residuals = sample.map { v =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var ci = 0
      while (ci < cents.length) {
        val c = cents(ci)
        val n = math.min(d, c.length)
        var dot = 0.0; var i = 0
        while (i < n) { dot += v(i).toDouble * c(i); i += 1 }
        if (!dot.isNaN && dot > bestDot) { bestDot = dot; best = ci }
        ci += 1
      }
      val cent = cents(best)
      Array.tabulate(d)(i => v(i) - (if (i < cent.length) cent(i) else 0f))
    }
    val books = Array.tabulate(m) { mi =>
      kmeansL2(residuals.map(_.slice(mi * dsub, (mi + 1) * dsub)), ksub, iters)
    }
    PqModel(cents, books)
  }

  /** Lloyd k-means under L2 with deterministic spread init and fixed
   *  iterations — the subspace-codebook trainer. */
  private def kmeansL2(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val n = points.length
    val kk = math.min(k, n)
    val dsub = points(0).length
    var cents = Array.tabulate(kk)(i => points((i.toLong * n / kk).toInt).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(kk)(new Array[Double](dsub))
      val counts = new Array[Int](kk)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var ci = 0
        while (ci < kk) {
          val c = cents(ci)
          var dist = 0.0; var i = 0
          while (i < dsub) { val df = (p(i) - c(i)).toDouble; dist += df * df; i += 1 }
          if (dist < bestD) { bestD = dist; best = ci }
          ci += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dsub) { s(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kk)(ci =>
        if (counts(ci) == 0) cents(ci)
        else sums(ci).map(x => (x / counts(ci)).toFloat))
    }
    cents
  }

  /** IVF-PQ build: train quantizers, assign + encode the corpus —
   *  the 32×-smaller sibling of [[ivfBuildQuantized]]. */
  def ivfBuildPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 5,
      sampleN: Int = 10000): IvfIndexPq = {
    val model = pqTrain(corpus, idCol, vecCol, nlist, m, ksub, iters, sampleN)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = model.cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("list", "centroid")
    val bookDf = (for {
      mi <- model.books.indices
      j <- model.books(mi).indices
    } yield (mi, j, model.books(mi)(j))).toDF("sub", "code", "entry")
    IvfIndexPq(centDf, bookDf, ivfAssignPq(centDf, bookDf, corpus, idCol, vecCol))
  }

  /** Assign + PQ-encode a batch against stored quantizer frames
   *  (map-side — the incremental-add path): rows to append to
   *  `assigned`. */
  def ivfAssignPq(
      centroids: DataFrame,
      codebooks: DataFrame,
      batch: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val cents = collectCentroids(centroids)
    val books = collectBooks(codebooks)
    batch.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("list",
        element_at(functions.nearestLists(col("n_vec"), cents, 1), 1))
      .select(col("list"), col("n_id"),
        functions.pqEncode(col("n_vec"), col("list"), cents, books).as("n_codes"))
  }

  /**
   * Top-k over an [[ivfBuildPq]] index by asymmetric distance (ADC):
   * each probe computes one LUT per probed list map-side
   * ([[functions.pqLut]] — O(ksub·d) once per query-list), candidates
   * come from the same hash-partitioned list equi-join as every IVF
   * variant, and scoring is O(M) table lookups per candidate
   * ([[functions.pqAdc]]) instead of the O(D) full dot — the FAISS
   * billion-scale serving trade. Returns (q_id, n_id, adc, rank);
   * `adc` approximates the inner product, so ranking is approximate
   * even at `nProbe = nlist` (verify recall structurally, not by
   * equality with the exact searchers).
   */
  def ivfProbePq(
      index: IvfIndexPq,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cents = collectCentroids(index.centroids)
    val books = collectBooks(index.codebooks)
    val c = index.assigned
    val q = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("list",
        explode(functions.nearestLists(col("q_vec"), cents, math.min(nProbe, cents.length))))
      .withColumn("lut", functions.pqLut(col("q_vec"), col("list"), cents, books))
      .select(col("q_id"), col("list"), col("lut"))
    rankTopK(
      q.join(c, q("list") === c("list") && col("q_id") =!= col("n_id"))
        .withColumn("adc", functions.pqAdc(col("lut"), col("n_codes"))),
      "adc", k)
  }

  /**
   * [[ivfProbePq]] + exact re-rank (the FAISS `IndexRefineFlat` stage):
   * ADC selects `refine` candidates per probe from the compressed
   * lists, then ONLY those candidates fetch their full vectors from
   * `corpus` (broadcast semi-join on id — the corpus never shuffles)
   * and re-rank by exact cosine. This is the production serving shape:
   * the 32×-compressed index does the heavy winnowing, the exact
   * kernel touches `probes × refine` rows, and the final ranking is
   * exact over the candidate set — immune to ADC's approximation noise.
   * Returns (q_id, n_id, cos, rank).
   */
  def ivfProbePqRefined(
      index: IvfIndexPq,
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nProbe: Int = 4,
      refine: Int = 50): DataFrame = {
    val cand = ivfProbePq(index, probes, idCol, vecCol, k = math.max(k, refine), nProbe)
      .select(col("q_id"), col("n_id"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
      .join(broadcast(cand), "n_id")
    val q = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    rankTopK(
      c.join(broadcast(q), "q_id")
        .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec"))),
      "cos", k)
  }

  /** Read a `codebooks` frame back into the M × ksub × d/M array the
   *  kernels embed (driver-tiny, like [[collectCentroids]]). */
  private def collectBooks(codebooks: DataFrame): Array[Array[Array[Float]]] = {
    val rows = codebooks.select(col("sub"), col("code"), col("entry"))
      .orderBy("sub", "code").collect()
    require(rows.nonEmpty, "empty codebook frame — build the index first")
    val m = rows.map(_.getInt(0)).max + 1
    Array.tabulate(m) { mi =>
      rows.filter(_.getInt(0) == mi).map(_.getSeq[Float](2).toArray)
    }
  }

  private def collectCentroids(centroids: DataFrame): Array[Array[Float]] = {
    val rows = centroids.select(col("list"), col("centroid")).orderBy("list").collect()
    require(rows.nonEmpty, "empty centroid frame — build the index first")
    rows.map(r => r.getSeq[Float](1).toArray)
  }

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
    rankTopK(candidates
      .withColumn("cos", functions.cosineSimilarity(col("q_vec"), col("n_vec"))),
      "cos", k)
  }

  /** (j, i) index stride for [[randomProjection]]'s sign matrix: input
   *  dimension must stay below this so index pairs never collide. */
  val ProjIndexStride: Long = 1L << 20

  /**
   * Johnson–Lindenstrauss random projection to `outDim` dimensions with
   * a Rademacher (±1) sign matrix, scaled by 1/√outDim so inner
   * products and distances are preserved in expectation (Achlioptas
   * 2003: database-friendly random projections). The cheap front end of
   * an embedding pipeline — shrink 1024-dim vectors to 64 before
   * LSH/IVF indexing, at a distortion bound that depends only on
   * `outDim`, not the input dimension.
   *
   * The sign matrix is never materialized: entry (j, i) derives from
   * the engine-portable [[Sampling.hashBucket]] BIGINT arithmetic on
   * index `j·2²⁰ + i`, so the projection is deterministic across runs,
   * partitionings, and engines — an external SQL auditor replays it
   * bit-for-bit (the float→double widening and the left-to-right
   * summation order are both IEEE-exact and order-stable). One static
   * codegen'd kernel call per row ([[RandomProject]] — the equivalent
   * higher-order-function form pays an interpreted lambda per
   * sign-matrix entry); a map-side projection with no shuffle at any
   * scale. Input dimension must be < 2²⁰ (checked).
   */
  def randomProjection(
      vec: Column,
      outDim: Int,
      salt: Long = Sampling.DefaultSalt): Column = {
    require(outDim > 0 && outDim <= 4096, s"outDim $outDim not in [1, 4096]")
    org.apache.spark.sql.graftshim.SparkInternals.column(RandomProject(
      org.apache.spark.sql.graftshim.SparkInternals.expr(vec),
      outDim, salt, ProjIndexStride))
  }
}
