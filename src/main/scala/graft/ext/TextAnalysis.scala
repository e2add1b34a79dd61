package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Text-analysis operators for LLM-data pipelines (SURVEY.md §0 north
 * star): token statistics, quality ratios, n-gram shingling, marker-based
 * language identification, and document fingerprints. Everything is pure
 * `Column` expressions (whole-stage codegen; no UDFs), so each derived
 * column is a map-side projection — no shuffle at any scale.
 *
 * The language-ID heuristic is deliberately SQL-expressible (distinct
 * stopword-marker hits per language, fixed-priority tie-break) so the
 * DuckDB oracle can replay it exactly.
 */
object TextAnalysis {

  /** Whitespace tokenizer (the `documents` fixture is space-delimited). */
  def tokens(text: Column): Column = split(text, " ")

  /** Sliding-window token chunks: window of `chunkTokens` advancing by
   *  `stride` (overlap = chunkTokens − stride), the context-window
   *  chunking step of a training/RAG pipeline. Built entirely from
   *  codegen'd collection functions (sequence/transform/slice), so
   *  chunking is a map-side projection — no shuffle, no UDF; one
   *  [[org.apache.spark.sql.functions.posexplode]] downstream fans the
   *  array out to (chunk_idx, chunk_text) rows. The last window clamps at
   *  the end of the document; a document at or under `chunkTokens` yields
   *  exactly one chunk. */
  def chunks(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got chunkTokens=$chunkTokens stride=$stride")
    val toks = tokens(text)
    val extra = greatest(size(toks) - lit(chunkTokens), lit(0))
    val numChunks = (floor((extra + lit(stride - 1)) / lit(stride)) + 1).cast("int")
    transform(sequence(lit(0), numChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " "))
  }

  /** [[chunks]] exploded to one row per (id, chunk_idx, chunk_text). */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      stride: Int): DataFrame =
    df.select(col(idCol),
      posexplode(chunks(col(textCol), chunkTokens, stride)).as(Seq("chunk_idx", "chunk_text")))

  /** Canonical text form: collapse whitespace runs, trim, lowercase —
   *  the standard first pass before dedup/fingerprinting so formatting
   *  variants hash identically. Pure projection, no shuffle. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Redact URLs / emails / IPv4 addresses with typed placeholder tokens
   *  (training-data PII scrubbing). Patterns are deliberately restricted
   *  to the RE2-compatible subset (no backrefs / lookaround) so external
   *  engines — and the DuckDB oracle — replay the exact same scrub.
   *  URL first: an address inside a URL is already consumed by it. */
  def scrubPii(text: Column): Column = {
    val url = regexp_replace(text, "https?://\\S+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  }

  /** `size(tokens(text))` via the zero-allocation byte-scan kernel —
   *  the token array is never materialized just to be counted. */
  def tokenCount(text: Column): Column = functions.spaceTokenCount(text)

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit
   *  runs, punctuation runs, whitespace — the standard BPE pre-split. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Approximate BPE token count: number of pre-tokenizer segments,
   *  excluding pure-whitespace runs (each segment maps to ≥1 BPE token;
   *  this is the usual cheap budget estimator for training corpora). */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(BpePattern), lit(0)),
      t => trim(t) =!= ""))

  /** Mean token length in characters (double). Non-space char count =
   *  total chars − spaces = length − (tokens − 1); pure arithmetic over
   *  the counting kernel, replacing a regexp_replace that allocated a
   *  space-stripped copy of every document. */
  def avgTokenLength(text: Column): Column = {
    val nTok = functions.spaceTokenCount(text)
    (length(text) - (nTok - lit(1))).cast("double") / nTok
  }

  /** Distinct word n-gram shingles ("a b c" style), the dedup unit. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val starts = sequence(lit(1), size(toks) - lit(n - 1))
    array_distinct(
      when(size(toks) >= n, transform(starts, i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array()))
  }

  /** Duplicate word-n-gram fraction — the Gopher-style repetition
   *  quality filter (Rae et al. 2021, §A1.1: "fraction of duplicate
   *  n-grams"): 1 − distinct/total n-grams, 0 for docs shorter than `n`
   *  tokens. Looping or template-heavy text scores high and gets
   *  filtered before pre-training. Pure codegen'd Column arithmetic. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(tokenCount(text) - lit(n - 1), lit(0))
    // distinct count via the zero-allocation hashed-shingle kernel (sorted
    // distinct 64-bit hashes straight off the UTF-8 bytes) — the string
    // transform/array_distinct form is ~10x slower; a 64-bit in-document
    // collision (prob ~k²/2⁶⁴) is the standard hashed-shingling trade
    when(total > 0,
      lit(1.0) - size(functions.hashedShingles(text, n)).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Marker stopwords per language (distinct-hit scoring). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private def markerScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)), array(markers.map(lit): _*)))

  /**
   * Heuristic language ID: distinct marker hits per language, highest
   * score wins, ties broken by declaration order, all-zero → "und".
   */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> markerScore(text, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    // first-wins CASE chain in declaration order (en outermost)
    scores.foldRight(lit("und")) { case ((l, s), elseCol) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Fraction of non-alphanumeric, non-space characters (punctuation/
   *  symbol density — high values flag boilerplate and markup).
   *  Numerator is the [[functions.punctCount]] counting kernel — one
   *  byte-level pass, no rewritten copy of the document (the
   *  regexp_replace form allocated a Matcher + rewritten string per row
   *  and was the suite's slowest scalar at sf0.1). */
  def punctRatio(text: Column): Column =
    // nullif guard: an empty document would DIVIDE_BY_ZERO under Spark
    // 4's default ANSI mode; score it 0 instead of failing the job
    coalesce(round(functions.punctCount(text)
      .cast("double") / nullif(length(text), lit(0)), 6), lit(0.0))

  /** Fraction of tokens found in `stopwords` (default: the English
   *  markers) — natural prose sits well above machine-generated or
   *  keyword-stuffed text. Both counts are single-pass byte kernels;
   *  no token-array materialization. */
  def stopwordRatio(
      text: Column,
      stopwords: Seq[String] = langMarkers.head._2): Column =
    round(functions.stopwordHits(text, stopwords)
      .cast("double") / functions.spaceTokenCount(text), 6)

  /**
   * Quality score in [0,1]: penalizes extreme repetition (low distinct
   * ratio), absurd mean token length, and very short documents — the
   * usual pre-training heuristics (length/stopword/punct family;
   * [[punctRatio]]/[[stopwordRatio]] are the standalone signals).
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val distinctRatio = distinctTokenCount(text).cast("double") / nTok
    val avgLen = avgTokenLength(text)
    val lenOk = when(nTok >= 10, lit(1.0)).otherwise(nTok.cast("double") / 10.0)
    val avgLenOk = when(avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    round(distinctRatio * lenOk * avgLenOk, 6)
  }

  /**
   * Model-based quality scoring: apply an exported LINEAR text
   * classifier (fastText-style bag-of-words / logistic regression —
   * the CCNet / LLaMA "wiki-like page" filter role) at corpus scale.
   * `logit = bias + Σ weight(token) / tokenCount` — the mean feature
   * weight plus bias, i.e. inference over averaged one-hot token
   * embeddings. The vocabulary ships INSIDE the expression as sorted
   * hash/weight arrays ([[functions.tokenWeightSum]]): scoring is one
   * map-side pass per document with O(log V) per token — no token
   * explode, no model join, no shuffle, whatever the corpus size.
   *
   * Determinism contract: weights that are dyadic rationals (k/2ⁿ —
   * e.g. 0.5, −0.25, 1.125) keep every partial sum exactly
   * representable, so the score is bit-identical across runs,
   * partitionings, and engines; an external SQL auditor replays it
   * with a token-explode + model-table join. Classify with
   * `linearScore(...) > threshold`.
   */
  def linearScore(
      text: Column,
      model: Map[String, Double],
      bias: Double = 0.0,
      seed: Long = TextHash.DefaultSeed): Column =
    lit(bias) + functions.tokenWeightSum(text, model, seed) /
      functions.spaceTokenCount(text).cast("double")

  /**
   * Corpus vocabulary: per-token total frequency (`tf`) and document
   * frequency (`df`, for IDF weighting), thresholded at `minCount`
   * occurrences. The canonical word-count shape: the token explode is
   * map-side, `tf` partial-aggregates before the shuffle so only one
   * row per (partition, token) moves, and `df` rides Spark's standard
   * two-phase distinct aggregation — no collect, no second pass over
   * the corpus.
   */
  def vocabulary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .filter(col("tf") >= minCount)

  /**
   * Per-document duplicated-n-gram fraction: the share of a document's
   * token n-grams that appear more than once ACROSS the corpus
   * (including its own repeats) — the cross-document complement of the
   * within-document repetition ratio, and the standard "duplicate
   * 50-gram fraction" quality signal of corpus-dedup pipelines (exact
   * duplicated spans survive near-dup dedup when embedded in otherwise
   * distinct pages). Documents shorter than `n` tokens score 0.
   *
   * Shape: map-side n-gram explode (grams carried as 64-bit hashes, not
   * strings — the shuffle moves 8 bytes per gram), one count aggregate
   * with map-side partial, one equi-join back. Linear in corpus token
   * count; no driver-side state.
   */
  def duplicateNgramFraction(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n $n must be positive")
    // same positional kernel as the span miners — no gram strings built
    val exploded = df.select(col(idCol),
      explode(functions.positionalGramHashes(col(textCol), n)).as("g"))
    val counts = exploded.groupBy("g").agg(count(lit(1)).as("cnt"))
    val frac = exploded.join(counts, "g")
      .groupBy(idCol)
      .agg(round(avg(when(col("cnt") > 1, 1.0).otherwise(0.0)), 6)
        .as("dup_ngram_frac"))
    df.select(col(idCol))
      .join(frac, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dup_ngram_frac"), lit(0.0)).as("dup_ngram_frac"))
  }

  /**
   * Composable C4/Gopher-style quality filter (Raffel et al. 2020 §2.2,
   * Rae et al. 2021 §A1.1): each document is judged by an independent
   * rule family — token-count bounds, mean-word-length band, minimum
   * stopword evidence, duplicate-n-gram ceiling, distinct-token floor —
   * and the result carries every per-rule verdict, a bitmask of FAILED
   * rules (`fail_mask`, bit i = rule i failed, 0 = clean), and the
   * conjunction (`kept`). Keeping the verdicts instead of just
   * filtering is what a corpus build needs: rule-level ablations,
   * "why was this dropped" audits, and re-filtering under new
   * thresholds without re-scanning the text.
   *
   * Every signal is a single-pass counting kernel or pure integer
   * arithmetic over one ([[functions.spaceTokenCount]],
   * [[functions.stopwordHits]], [[functions.hashedShingles]]) feeding
   * IEEE-double divisions both engines evaluate identically — a
   * map-side codegen'd projection, no shuffle at any scale.
   */
  def qualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 30,
      maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0,
      maxAvgTokenLen: Double = 10.0,
      minStopwordHits: Int = 2,
      maxRepetition: Double = 0.05,
      minDistinctRatio: Double = 0.35,
      stopwords: Seq[String] = langMarkers.head._2): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val rules: Seq[(String, Column)] = Seq(
      "len_ok" -> nTok.between(minTokens, maxTokens),
      "avg_word_ok" -> avgTokenLength(t).between(minAvgTokenLen, maxAvgTokenLen),
      "stopwords_ok" -> (functions.stopwordHits(t, stopwords) >= minStopwordHits),
      "repetition_ok" -> (repetitionRatio(t) <= maxRepetition),
      "distinct_ok" ->
        (distinctTokenCount(t).cast("double") / nTok >= minDistinctRatio))
    val failMask = rules.zipWithIndex
      .map { case ((_, c), i) => when(c, lit(0)).otherwise(lit(1 << i)) }
      .reduce(_ + _)
    df.select(col(idCol) +: rules.map { case (n, c) => c.as(n) } :+
      failMask.as("fail_mask") :+ rules.map(_._2).reduce(_ && _).as("kept"): _*)
  }

  /**
   * Corpus-wide exact duplicated-span removal (the "exact substring
   * dedup" of training-data pipelines, à la Lee et al. 2022
   * "Deduplicating Training Data Makes Language Models Better"): every
   * n-token span that occurs more than once ANYWHERE in the corpus —
   * across documents or repeated within one — keeps only its canonical
   * first occurrence (lexicographic min of (doc id, position)); tokens
   * covered by any other occurrence are dropped and the document is
   * rebuilt from the survivors. Exact duplicated boilerplate (license
   * headers, navigation chrome, templated paragraphs) disappears from
   * all but one document while the unique prose around it survives —
   * the span-level complement of the document-level near-dup dedup in
   * [[graft.ext.Dedup]]. A full exact-duplicate document loses every
   * token (`clean_text` empty) — span dedup subsumes exact doc dedup.
   *
   * Shape: grams travel as 64-bit hashes (8 B per gram through the
   * shuffle, never the strings); the gram aggregate partial-aggregates
   * map-side and only grams with `cnt > 1` — the duplicated minority —
   * flow into the join/explode stages, so the removal side scales with
   * the amount of duplication, not the corpus; the rebuild is one
   * groupBy collecting (pos, token) pairs re-ordered by a codegen'd
   * `array_sort` (no window, no skew pivot). Everything is equi-join +
   * hash-agg — linear in corpus token count, no driver-side state.
   * Overlapping duplicated spans union their covered positions.
   */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n $n must be positive")
    val occs = gramOccurrences(df, idCol, textCol, n)
    val dupGrams = occs.groupBy("g")
      .agg(count(lit(1)).as("cnt"), min("occ").as("canon"))
      .filter(col("cnt") > 1)
    val removals = occs.join(dupGrams, "g")
      .filter(col("occ") =!= col("canon"))
    cutAndRebuild(df, idCol, textCol, n, removals)
  }

  /** One row per DISTINCT n-token-gram hash of the corpus — the
   *  persistable index behind [[removeDuplicatedSpansIncremental]]
   *  (8 bytes per distinct gram; store it as a snapshot table and
   *  extend it per ingested batch). */
  def spanGramIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n $n must be positive")
    gramOccurrences(df, idCol, textCol, n).select(col("g")).distinct()
  }

  /** Table property a persisted span-gram index pins its gram size
   *  under ([[buildSpanGramIndexTable]]). */
  val SpanGramNProp = "graft.spangram.n"

  /** Persist [[spanGramIndex]] as a snapshot table with its gram size
   *  PINNED in the table properties — the same discipline as
   *  [[Dedup.buildMinhashIndexTables]]'s signature geometry: an index
   *  built at n=10 served at n=8 hashes DIFFERENT windows, the gram
   *  equi-join finds nothing, and every corpus span silently "survives"
   *  in the batch. The pin turns that silent miss into a loud refusal
   *  at serve time. */
  def buildSpanGramIndexTable(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      filesPerTable: Int = 16): graft.tables.SnapshotTable = {
    val grams = spanGramIndex(corpus, idCol, textCol, n).localCheckpoint()
    try {
      // clustered + bloomed on `g` (the buildMinhashIndexTables shape):
      // each file carries a tight gram-hash range plus a bloom, so the
      // INDEXED serve's key probe skips every file without a possible
      // batch-gram hit; the flat serve reads the table unchanged.
      // filesPerTable is a FLOOR: the file count scales with the gram
      // count so per-file blooms stay at their FP design point under
      // the manifest-size cap (saturated blooms at a fixed file count
      // made a 100×-scale all-novel serve pay for false-positive files
      // that had also grown 10× — bloomSizedFiles is that lesson)
      val files = graft.tables.FileBloom.bloomSizedFiles(
        filesPerTable, grams.count())
      val t = graft.tables.SnapshotTable.create(spark, root, grams.limit(1))
        .setProperties(Map(SpanGramNProp -> n.toString,
          "graft.bloom.columns" -> "g",
          "graft.bloom.manifest" -> "true"))
      t.overwrite(grams.repartitionByRange(files, col("g")))
      t
    } finally graft.ext.Dedup.release(grams)
  }

  /** Gram size a persisted span-gram index was built at — append and
   *  indexed-serve callers derive it FROM the pin (never call-site
   *  defaults, the minhash [[graft.ext.Dedup.indexGeometryOf]]
   *  discipline); an unpinned table refuses loudly. */
  def spanGramNOf(table: graft.tables.SnapshotTable): Int =
    table.properties().getOrElse(SpanGramNProp,
      throw new IllegalArgumentException(
        s"requirement failed: table ${table.root} pins no span-gram size — " +
          "not an index built by buildSpanGramIndexTable")).toInt

  /**
   * Extend a persisted span-gram index with `batch`'s FRESH grams only
   * (grams already indexed stay single-copy — their canonical lives in
   * the corpus), signed at the gram size the table PINS. Freshness is
   * decided against a KEY-PROBED read of the index (only files that may
   * hold one of the batch's grams are opened), so per-batch append cost
   * rides the batch, not the index size. Rows land range-sorted on `g`
   * so appended files keep tight stats and blooms; run
   * [[compactSpanGramIndex]] periodically to restore the file floor.
   * `action`/`expectVersion` support the streaming sinks' idempotence +
   * not-blind-append contract.
   */
  def spanGramIndexAppend(
      table: graft.tables.SnapshotTable,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      batchFiles: Int = 4,
      action: String = "append",
      expectVersion: Option[Long] = None,
      maxProbeKeys: Int = 1 << 20): Unit = {
    val n = spanGramNOf(table)
    val grams = spanGramIndex(batch, idCol, textCol, n).localCheckpoint()
    try {
      val fresh = grams.join(
        probeGrams(table, grams, maxProbeKeys), Seq("g"), "left_anti")
      table.appendAs(fresh.repartitionByRange(batchFiles, col("g")),
        action, expectVersion = expectVersion)
      ()
    } finally graft.ext.Dedup.release(grams)
  }

  /** Maintenance pass for a persisted span-gram index: full clustered
   *  rewrite on `g` ([[graft.tables.SnapshotTable.recluster]]) — after
   *  many [[spanGramIndexAppend]] batches each probe key may open one
   *  file per append; reclustering restores disjoint per-file gram
   *  ranges and rebuilds the blooms, with the gram-size pin carried
   *  forward. Returns files rewritten. */
  def compactSpanGramIndex(
      table: graft.tables.SnapshotTable,
      filesPerTable: Int = 16): Int = {
    spanGramNOf(table) // refuse non-index tables before rewriting them
    // floor: re-apply the bloom sizing rule at the current row count
    table.recluster(Seq("g"),
      graft.tables.FileBloom.bloomSizedFiles(filesPerTable,
        table.manifestEntries().map(_.rows).filter(_ > 0).sum))
  }

  /** The index grams that MAY match `grams` — a bounded key probe of the
   *  clustered/bloomed table ([[graft.tables.SnapshotTable.keyProbedRead]]:
   *  conservative file skipping, overlay-refusing). */
  private def probeGrams(
      table: graft.tables.SnapshotTable,
      grams: DataFrame,
      maxProbeKeys: Int): DataFrame = {
    val keys = grams.select(col("g")).distinct().limit(maxProbeKeys + 1)
      .collect().map(_.get(0))
    require(keys.length <= maxProbeKeys,
      s"batch gram key set exceeds maxProbeKeys=$maxProbeKeys — split the batch")
    table.keyProbedRead("g", keys.toSeq).select(col("g"))
  }

  /** [[removeDuplicatedSpansIncremental]] served from the PERSISTED
   *  index with file pruning — the q117/q118 serving discipline brought
   *  to span dedup: the batch's distinct gram hashes (driver-bounded by
   *  `maxProbeKeys`, loud on overflow) key-probe the gram table's
   *  manifest, so only files that may hold a batch gram are read where
   *  the flat serve streams the WHOLE index through the membership join
   *  per batch. Pruning is conservative file skipping and the index side
   *  is pure membership, so the result is EXACTLY the flat serve's
   *  (spec-pinned); the gram size comes from the table's pin. */
  def removeDuplicatedSpansIncrementalIndexed(
      table: graft.tables.SnapshotTable,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      maxProbeKeys: Int = 1 << 20): DataFrame = {
    val n = spanGramNOf(table)
    // ONE bounded collect of the batch's distinct gram hashes serves the
    // key probe directly — the serve contract already requires the key
    // set to fit maxProbeKeys (loud failure above), so a checkpoint of
    // the gram frame plus a second probe-collect job bought nothing the
    // collected array does not carry
    val keys = spanGramIndex(batch, idCol, textCol, n)
      .limit(maxProbeKeys + 1).collect().map(_.get(0))
    require(keys.length <= maxProbeKeys,
      s"batch gram key set exceeds maxProbeKeys=$maxProbeKeys — split the batch")
    removeDuplicatedSpansIncremental(
        batch, table.keyProbedRead("g", keys.toSeq).select(col("g")),
        idCol, textCol, n)
      .localCheckpoint()
  }

  /** Refuse a build/serve gram-size mismatch against what the index
   *  table was built with; tables that predate the pin (no property)
   *  pass — conservative, like the minhash check. */
  def checkSpanGramGeometry(
      table: graft.tables.SnapshotTable, n: Int): Unit =
    table.properties().get(SpanGramNProp).foreach(p =>
      require(p == n.toString,
        s"span-gram index ${table.root} was built with n=$p, serve called with n=$n"))

  /** [[removeDuplicatedSpansIncremental]] served from a PERSISTED,
   *  geometry-validated index table. */
  def removeDuplicatedSpansIncremental(
      index: graft.tables.SnapshotTable,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    checkSpanGramGeometry(index, n)
    removeDuplicatedSpansIncremental(batch, index.read(), idCol, textCol, n)
  }

  /**
   * Steady-state form of [[removeDuplicatedSpans]]: dedup an ingest
   * batch against an already-ingested corpus represented ONLY by its
   * [[spanGramIndex]] — the corpus text never re-scans. A batch span
   * whose gram exists in the index loses every batch occurrence (the
   * canonical copy lives in the corpus); a span fresh to the corpus
   * keeps its batch-canonical first occurrence exactly like batch mode.
   * With batch ids ordered after corpus ids, ingesting batch-by-batch
   * produces BIT-IDENTICAL cleaned text to one full-corpus batch run —
   * the invariant the spec pins with a randomized split model.
   *
   * Scale shape: the index side joins by gram hash (equi-join, 8 B
   * keys); the batch side is the small stream. Extend the index with
   * `spanGramIndex(batch…)` unioned in (grams of removed spans stay
   * indexed — their canonical already lives in the corpus).
   */
  def removeDuplicatedSpansIncremental(
      batch: DataFrame,
      indexGrams: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n $n must be positive")
    val occs = gramOccurrences(batch, idCol, textCol, n)
    val canon = occs.groupBy("g")
      .agg(count(lit(1)).as("cnt"), min("occ").as("canon"))
    val removals = occs.join(canon, "g")
      .join(indexGrams.select(col("g")).distinct().withColumn("_in_idx", lit(true)),
        Seq("g"), "left")
      .filter(col("_in_idx").isNotNull ||
        (col("cnt") > 1 && col("occ") =!= col("canon")))
    cutAndRebuild(batch, idCol, textCol, n, removals)
  }

  /** Gram occurrences of every document: (id, pos, g, occ) where `occ`
   *  is the (doc, pos) struct canonical selection min-orders on —
   *  unbounded ids/positions (no arithmetic encoding to overflow at
   *  corpus scale). */
  private def gramOccurrences(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // grams hash through the zero-allocation positional kernel (one byte
    // pass per doc, chained token hashes per window) — the array_join+
    // xxhash64 form allocated every gram string; short docs yield an
    // empty array, NULL text no rows (posexplode of NULL)
    df.select(col(idCol),
        posexplode(functions.positionalGramHashes(col(textCol), n)).as(Seq("pos", "g")))
      .withColumn("occ", struct(col(idCol).as("d"), col("pos").as("p")))

  /** Cut every token covered by a removal occurrence (positions
   *  pos..pos+n−1, overlaps unioned) and rebuild each document from the
   *  survivors — ordered by a codegen'd `array_sort`, no window.
   *
   *  Only documents that actually HAVE a removal pay the heavy
   *  explode→anti-join→collect_list rebuild: `df` semi-joins against the
   *  distinct affected doc ids first, so the per-token struct shuffle
   *  scales with the duplicated minority (~the docs containing repeated
   *  spans), not the corpus. Untouched documents emit through a pure
   *  projection — `split`/`array_join` on the same single-space
   *  delimiter is the identity, so their `clean_text` is bit-identical
   *  to what the rebuild would produce, with zero removed tokens (NULL
   *  text stays the NULL-count / empty-text convention of the join
   *  path). Before this split, the 100×-scale row exploded EVERY
   *  document's tokens into (pos, token) structs through one shuffle —
   *  the recorded exp-1.5 spill driver when only ~10 % of docs needed
   *  rebuilding. */
  private def cutAndRebuild(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      removals: DataFrame): DataFrame = {
    val covered = removals
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val affectedIds = covered.select(col(idCol)).distinct()
    val affected = df.join(affectedIds, Seq(idCol), "left_semi")
    val tokRows = affected.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("p", "token")))
    val kept = tokRows.join(covered, Seq(idCol, "p"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("p"), col("token")))),
          x => x.getField("token")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    val rebuiltOut = affected
      .select(col(idCol), size(tokens(col(textCol))).as("n_toks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"))
    val untouchedOut = df.join(affectedIds, Seq(idCol), "left_anti")
      .select(col(idCol),
        coalesce(array_join(tokens(col(textCol)), " "), lit("")).as("clean_text"),
        (size(tokens(col(textCol))) * lit(0)).cast("long").as("n_removed"))
    rebuiltOut.unionByName(untouchedOut)
  }

  /**
   * Per-document mean unigram log-probability under the corpus's own
   * unigram language model with add-one smoothing — the cheap stand-in
   * for the perplexity filtering of CCNet/CC-style pipelines (Wenzek et
   * al. 2020): documents far below the corpus mean are gibberish or
   * vocabulary outliers, documents far above are boilerplate built from
   * the most common words; both tails get reviewed or dropped. Self-
   * scoring (model trained on the scored corpus) means no OOV path.
   *
   * score(d) = avg over tokens t of ln((tf(t) + 1) / (total + |V|))
   *
   * Integer tf/total/|V| feed one IEEE division and ln per token — an
   * external SQL engine replays the exact score. Shape: one token
   * explode, one vocab hash-agg, one equi-join back, one per-doc avg;
   * the one-row totals frame attaches by broadcast (the q72 scalar-agg
   * NLJ shape, pinned in PlanSpec). Linear, no driver state.
   */
  def unigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val stats = vocab.agg(sum("tf").as("total"), count(lit(1)).as("vs"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(stats))
      .withColumn("lp", log((col("tf") + lit(1.0)) / (col("total") + col("vs"))))
      .groupBy(idCol).agg(round(avg("lp"), 4).as("avg_logprob"))
  }

  /**
   * Bigram-LM log-probability — the CCNet / KenLM perplexity-filter role
   * one order up from [[unigramLogProb]]: score = avg over a document's
   * bigrams of ln P(w₂|w₁), add-one smoothed over the corpus counts:
   * P(w₂|w₁) = (c(w₁,w₂)+1) / (ctx(w₁)+|V|), where ctx(w₁) =
   * Σ_w c(w₁,w) (occurrences of w₁ as a bigram left context) and |V| is
   * the corpus distinct-unigram count. Low scores flag improbable token
   * SEQUENCES — repetition, shuffled text, boilerplate — that unigram
   * frequencies alone cannot see. Documents with fewer than two tokens
   * have no bigrams and drop out (same convention as the oracle's join).
   *
   * Shape: bigram pairs via map-side array zip (no positional
   * self-join), one (w₁,w₂) count agg, one w₁ context agg derived from
   * it (bigram-model-sized, not corpus-sized), join back to occurrences,
   * one-row |V| by broadcast (the q72 scalar-agg shape), per-doc avg —
   * linear in corpus size, and the model aggs shuffle bigram TYPES, not
   * occurrences. Portability: integer counts into IEEE ln/division;
   * the per-doc avg rounds to 4 decimals to absorb summation order
   * (the [[unigramLogProb]] argument).
   */
  /** One row per (doc, bigram occurrence), extracted by a map-side array
   *  zip of the token list against its own tail — no positional
   *  self-join, no shuffle. Documents with fewer than two tokens yield
   *  no rows. */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val n = size(tk)
    df.select(col(idCol),
        explode(arrays_zip(
          slice(tk, lit(1), n - 1).as("w1"),
          slice(tk, lit(2), n - 1).as("w2"))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val bi = bigramPairs(df, idCol, textCol)
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vstats = df.select(explode(tokens(col(textCol))).as("token"))
      .agg(count_distinct(col("token")).as("vs"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vstats))
      .withColumn("lp", log((col("c2") + lit(1.0)) / (col("c1") + col("vs"))))
      .groupBy(idCol).agg(round(avg("lp"), 4).as("avg_logprob2"))
  }

  /**
   * Collocation mining by pointwise mutual information: the corpus's
   * top-`k` bigrams (with ≥ `minCount` occurrences) ranked by
   * PMI(w₁,w₂) = ln c(w₁,w₂) + ln N − ln cl(w₁) − ln cr(w₂), where N is
   * the total bigram count and cl/cr are the words' left/right-position
   * marginals — the classic phrase detector (Mikolov et al. 2013 use
   * the same score to glue "new_york" before word2vec training), and
   * the `minCount` floor is what keeps rare-pair noise (PMI's known
   * bias) out of the top slots.
   *
   * Scale: every aggregate is over bigram TYPES (model-sized), not
   * occurrences; the log-space sum never overflows (c·N products would
   * pass 2⁶³ on a 100 TB corpus); the final ranking is a top-k over the
   * ≥ minCount types (TakeOrderedAndProject — per-partition heaps, no
   * global sort). Portability: ordering uses the ROUNDED score (4
   * decimals, absorbing last-ulp ln differences across libm
   * implementations) with a lexicographic (w₁,w₂) tiebreak, so the
   * selected set and order replay exactly in any SQL engine.
   */
  def pmiCollocations(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5,
      k: Int = 20): DataFrame = {
    val c2 = bigramPairs(df, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cl = c2.groupBy("w1").agg(sum("c2").as("cl"))
    val cr = c2.groupBy("w2").agg(sum("c2").as("cr"))
    val nbi = c2.agg(sum("c2").as("n_bi"))
    c2.filter(col("c2") >= minCount)
      .join(cl, "w1").join(cr, "w2")
      .crossJoin(broadcast(nbi))
      .withColumn("pmi", round(
        log(col("c2")) + log(col("n_bi")) - log(col("cl")) - log(col("cr")), 4))
      .select(col("w1"), col("w2"), col("c2"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every corpus
   * document by the log-likelihood RATIO between a TARGET-domain unigram
   * LM and the raw-corpus LM —
   *
   * w(d) = avg over token occurrences t of
   *          ln((tf_target(t)+1)/(total_target+|V|))
   *        − ln((tf_raw(t)+1)/(total_raw+|V|))
   *
   * Positive w(d): the document looks more like the target domain than
   * like the corpus at large — rank by w (or Gumbel-perturb for
   * sampled selection) to build a target-shaped training mix. Both LMs
   * are add-one smoothed over the SHARED vocabulary |V| (raw ∪ target
   * distinct tokens), so an unseen-in-target token contributes the
   * floor probability rather than −∞, and the score replays exactly in
   * any SQL engine (integer counts into IEEE ln/division — the
   * [[unigramLogProb]] portability argument). The paper hashes n-gram
   * features into buckets for speed at 10⁹ docs; that variant is
   * [[functions.positionalGramHashes]] feeding the same count/ratio
   * arithmetic, traded here for string unigrams so external engines can
   * replay the exact weights.
   *
   * Shape: two token explodes (corpus + target), two vocab hash-aggs,
   * one vocab-sized left join, one equi-join back to corpus occurrences,
   * one per-doc avg; the one-row totals attach by broadcast (the q72
   * scalar-agg NLJ shape). Linear in corpus + target size.
   */
  def dsirWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val ctoks = corpus.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val craw = ctoks.groupBy("token").agg(count(lit(1)).as("tf_raw"))
    val ttoks = target.select(explode(tokens(col(textCol))).as("token"))
    val ttf = ttoks.groupBy("token").agg(count(lit(1)).as("tf_tgt"))
    // shared vocabulary: raw ∪ target (target-only tokens matter for
    // |V| even though no corpus occurrence joins to them)
    val vocab = craw.join(ttf, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("tf_raw"), lit(0L)).as("tf_raw"),
        coalesce(col("tf_tgt"), lit(0L)).as("tf_tgt"))
    val stats = vocab.agg(
      sum("tf_raw").as("total_raw"), sum("tf_tgt").as("total_tgt"),
      count(lit(1)).as("vs"))
    ctoks.join(vocab, "token")
      .crossJoin(broadcast(stats))
      .withColumn("lr",
        log((col("tf_tgt") + lit(1.0)) / (col("total_tgt") + col("vs"))) -
          log((col("tf_raw") + lit(1.0)) / (col("total_raw") + col("vs"))))
      // + 0.0 canonicalizes IEEE −0.0 (a near-zero ratio rounding down)
      // to +0.0 so replaying engines agree on the sign of zero
      .groupBy(idCol).agg((round(avg("lr"), 4) + lit(0.0)).as("dsir_weight"))
  }

  /** Enrich a corpus with the full text-analysis column family. */
  def enrich(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_distinct_tokens", distinctTokenCount(t))
      .withColumn("avg_token_len", round(avgTokenLength(t), 6))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", functions.fingerprint64(t))
      .withColumn("simhash", functions.simhash64(tokens(t)))
  }

  /**
   * FILL-IN-MIDDLE transformation (Bavarian et al. 2022, "Efficient
   * training of language models to fill in the middle" — the
   * Codex/StarCoder code-data prep): a deterministic `rate` fraction of
   * documents is rewritten PSM-style — two cut points split the text
   * into prefix/middle/suffix, emitted as
   * `<PRE>prefix<SUF>suffix<MID>middle` so the model learns to infill;
   * the rest pass through (the FIM-rate knob of those papers). Returns
   * the input plus `fim` (was this row transformed) and `text_fim`.
   *
   * Everything derives from the [[Sampling.hashBucket]] id-hash
   * arithmetic — selection AND both cut points — so the exact
   * transformed corpus is reproducible across runs, engines, and
   * cluster sizes, and an external engine replays it down to the
   * character (character-position cuts, `substr` on both sides). One
   * map-side projection: no shuffle, no RNG state.
   */
  def fimTransform(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double,
      preTok: String = "<PRE>",
      sufTok: String = "<SUF>",
      midTok: String = "<MID>",
      salt: Long = Sampling.DefaultSalt): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate not in [0,1]")
    val text = col(textCol)
    val len = length(text)
    val selected = Sampling.hashBucket(col(idCol), salt) <
      lit(Sampling.threshold(rate))
    // cut points from two derived hash streams: 0 <= p1 <= p2 <= len
    val p1 = pmod(Sampling.hashBucket(col(idCol), salt + 1),
      (len + 1).cast("long")).cast("int")
    val p2 = p1 + pmod(Sampling.hashBucket(col(idCol), salt + 2),
      (len - p1 + 1).cast("long")).cast("int")
    val psm = concat(
      lit(preTok), text.substr(lit(1), p1),
      lit(sufTok), text.substr(p2 + 1, len - p2),
      lit(midTok), text.substr(p1 + 1, p2 - p1))
    docs
      .withColumn("fim", selected && text.isNotNull)
      .withColumn("text_fim", when(col("fim"), psm).otherwise(text))
  }
}
