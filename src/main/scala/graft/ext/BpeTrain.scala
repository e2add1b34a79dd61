package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-level BPE TRAINING — learning the ordered merges list a trained
 * tokenizer IS (Sennrich et al. 2016; Radford et al. 2019 byte-level
 * variant), the counterpart of [[Bpe]]'s inference: the reference
 * pipeline tokenizes training data with an exported `merges.txt`; this
 * learns that artifact from the corpus itself.
 *
 * Algorithm (exact, not sampled): words are space-split byte sequences
 * (the single-space convention every text kernel here uses); each round
 * counts every adjacent piece-id pair weighted by word frequency, picks
 * the winner by (count desc, left id asc, right id asc) — a total order,
 * so training is deterministic regardless of partitioning — assigns it
 * id `256 + round`, and rewrites the words ([[Bpe.applyMerge]],
 * left-to-right non-overlapping, the same adjacency semantics
 * [[Bpe.encodeWord]] applies at inference). Training stops early when no
 * pair reaches `minCount`.
 *
 * Scale: everything runs over the word-TYPE table — `groupBy(word)`
 * collapses a 100 TB corpus to its distinct words before any per-round
 * work, the classic Sennrich optimization (pair counts are identical
 * because frequency rides along as a weight). Two regimes, the
 * [[Dedup.connectedComponents]] hybrid:
 *
 *  - type table fits the driver (probed via `limit(n+1).count`, default
 *    ≤ 2²⁰ types): collect once and run the merge loop in memory with
 *    INCREMENTAL pair counting (inverted index + lazy priority queue —
 *    each merge touches only the words containing the winning pair), so
 *    a production-scale 50k-merge vocabulary costs O(corpus-types·len)
 *    total, not O(rounds·types) — zero Spark jobs after the collect;
 *  - larger: the table stays distributed; each round is ONE aggregation
 *    (explode adjacent pairs → partial-agg'd sum by pair → `limit(1)`
 *    of a total order, only the single winner reaches the driver) and
 *    one codegen'd projection ([[BpeApplyMerge]]) to rewrite the types,
 *    `localCheckpoint`ed per round so lineage — and with it planning
 *    time — stays O(1) across rounds, not O(rounds).
 *
 * Both paths share the winner rule and the rewrite kernel, so they
 * produce the SAME merges list (spec-pinned); the split is an execution
 * choice, not a semantic one.
 */
object BpeTrain {

  /** Learn `numMerges` merges from `docs(textCol)`. Returns piece-ID
   *  pairs in rank order (merge `i` creates id `256 + i`) — feed to
   *  [[Bpe.compileIds]] / [[functions.bpeEncodeIds]] for inference, or
   *  [[Bpe.renderMerges]] for the `merges.txt` string interchange form. */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 2L,
      driverMaxWordTypes: Long = 1L << 20): Seq[(Int, Int)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    if (numMerges == 0) return Nil
    // octet_length, not length: training is BYTE-level, and a 1-CHAR
    // word can still be a multi-byte pair (e.g. "é" = 0xC3 0xA9) —
    // char-length filtering would silently exclude every such word
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(octet_length(col("w")) >= 2) // 1-BYTE words never form a pair
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // persist around the dispatch probe: the probe and the training
    // entry otherwise each run the full corpus tokenize+aggregate —
    // the dominant cost at scale — twice
    words.persist()
    try {
      val probeLimit = math.min(driverMaxWordTypes + 1, Int.MaxValue.toLong).toInt
      if (words.limit(probeLimit).count() <= driverMaxWordTypes)
        trainDriver(words, numMerges, minCount)
      else
        trainDistributed(words, numMerges, minCount)
    } finally { words.unpersist(); () }
  }

  /** In-memory merge loop over a collected word-type table, with
   *  INCREMENTAL pair counting (the HuggingFace-tokenizers scheme): pair
   *  counts and a pair→words inverted index build once; each merge
   *  updates only the words that CONTAIN the winning pair (subtract
   *  their old pair contributions, rewrite, add the new ones), and the
   *  winner comes off a lazy-invalidation priority queue. A full
   *  recount per round would be O(rounds · corpus-types) — untenable at
   *  a 50k-merge production vocabulary; this is O(types·len) to build
   *  plus O(affected-word length) per merge. Winner rule unchanged:
   *  count desc, then packed (left, right) key asc — the packed long's
   *  natural order IS (left asc, right asc) for non-negative ids. */
  private def trainDriver(
      words: DataFrame,
      numMerges: Int,
      minCount: Long): Seq[(Int, Int)] = {
    // byte extraction through the SAME kernel the distributed path uses
    // ([[functions.utf8Bytes]], raw UTF8String bytes): a java.lang.String
    // round trip would substitute U+FFFD for invalid UTF-8 and the two
    // paths could learn different merges on byte-dirty corpora
    val types: Array[(Array[Int], Long)] = words
      .select(graft.ext.functions.utf8Bytes(col("w")).as("ids"), col("cnt"))
      .collect().map { r =>
        (r.getSeq[Int](0).toArray, r.getLong(1))
      }
    val seqs: Array[Array[Int]] = types.map(_._1)
    val weights: Array[Long] = types.map(_._2)
    @inline def key(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xFFFFFFFFL)

    val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val wordsOf = new java.util.HashMap[java.lang.Long, java.util.HashSet[Integer]]()
    // (count desc, packed key asc); entries are snapshots — stale ones
    // (count no longer current) are discarded on pop
    val queue = new java.util.PriorityQueue[(Long, Long)](
      (a: (Long, Long), b: (Long, Long)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      })
    def bump(k: Long, delta: Long, wordIdx: Int): Unit = {
      val nv = counts.merge(k, java.lang.Long.valueOf(delta), (a, b) => a + b)
      if (nv <= 0) counts.remove(k)
      // push on EVERY surviving change, decreases included: the old
      // entry is now stale (liveness check discards it), so without a
      // fresh entry at the decreased count the pair would silently
      // drop out of contention
      else queue.add((nv.longValue(), k))
      if (delta > 0)
        wordsOf.computeIfAbsent(k, _ => new java.util.HashSet[Integer]())
          .add(Integer.valueOf(wordIdx))
      // negative deltas leave the membership set: the word may still
      // contain the pair at another position; stale members cost one
      // containment re-check at merge time, never correctness
    }
    def addWordPairs(w: Int, sign: Long): Unit = {
      val ids = seqs(w)
      var i = 0
      while (i < ids.length - 1) {
        bump(key(ids(i), ids(i + 1)), sign * weights(w), w)
        i += 1
      }
    }
    seqs.indices.foreach(w => if (seqs(w).length >= 2) addWordPairs(w, 1L))

    val merges = Seq.newBuilder[(Int, Int)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // pop to the first LIVE entry: count still current for its key
      var bestKey = -1L
      var bestCnt = 0L
      var searching = true
      while (searching) {
        val top = queue.poll()
        if (top == null) { searching = false }
        else {
          val cur = counts.get(top._2)
          if (cur != null && cur.longValue() == top._1) {
            bestKey = top._2; bestCnt = top._1; searching = false
          }
        }
      }
      if (bestCnt < minCount) done = true
      else {
        val l = (bestKey >>> 32).toInt
        val r = (bestKey & 0xFFFFFFFFL).toInt
        merges += ((l, r))
        val mergedId = 256 + round
        val members = wordsOf.remove(java.lang.Long.valueOf(bestKey))
        counts.remove(java.lang.Long.valueOf(bestKey))
        if (members != null) {
          val it = members.iterator()
          while (it.hasNext) {
            val w = it.next().intValue()
            val ids = seqs(w)
            // stale membership (pair already merged away here): skip
            var contains = false
            var i = 0
            while (!contains && i < ids.length - 1) {
              if (ids(i) == l && ids(i + 1) == r) contains = true
              i += 1
            }
            if (contains) {
              addWordPairs(w, -1L)
              seqs(w) = Bpe.applyMerge(ids, l, r, mergedId)
              if (seqs(w).length >= 2) addWordPairs(w, 1L)
            }
          }
        }
        // the merged pair's own count must stay gone even if a stale
        // queue entry resurfaces — counts.remove above guarantees the
        // liveness check fails for it
        round += 1
      }
    }
    merges.result()
  }

  /** Distributed merge loop: the word-type table never leaves the
   *  cluster; only each round's single winning pair does. */
  private def trainDistributed(
      words: DataFrame,
      numMerges: Int,
      minCount: Long): Seq[(Int, Int)] = {
    val asIds = words.select(
      graft.ext.functions.utf8Bytes(col("w")).as("ids"), col("cnt"))
    var cur = asIds.localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, Int)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val winner = cur
        .select(explode(expr(
          "transform(sequence(0, size(ids) - 2), i -> struct(ids[i] as l, ids[i + 1] as r))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (winner.isEmpty) done = true
      else {
        val row = winner.head
        val (l, r) = (row.getInt(0), row.getInt(1))
        merges += ((l, r))
        val next = cur
          .select(graft.ext.functions.bpeApplyMerge(col("ids"), l, r, 256 + round).as("ids"),
            col("cnt"))
          .filter(size(col("ids")) >= 2)
          .localCheckpoint(true)
        cur.unpersist()
        cur = next
        round += 1
      }
    }
    cur.unpersist()
    merges.result()
  }
}
