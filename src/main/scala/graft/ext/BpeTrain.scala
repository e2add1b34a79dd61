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
 *    ≤ 2²⁰ types): collect once and run the merge loop in memory —
 *    `numMerges` rounds with zero Spark jobs, the right trade when the
 *    expensive part was the corpus scan;
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

  /** In-memory merge loop over a collected word-type table. */
  private def trainDriver(
      words: DataFrame,
      numMerges: Int,
      minCount: Long): Seq[(Int, Int)] = {
    var types: Array[(Array[Int], Long)] = words.collect().map { r =>
      val bytes = r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (bytes.map(_ & 0xFF), r.getLong(1))
    }
    val merges = Seq.newBuilder[(Int, Int)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      types.foreach { case (ids, cnt) =>
        var i = 0
        while (i < ids.length - 1) {
          val key = java.lang.Long.valueOf(
            (ids(i).toLong << 32) | (ids(i + 1).toLong & 0xFFFFFFFFL))
          counts.merge(key, java.lang.Long.valueOf(cnt), (a, b) => a + b)
          i += 1
        }
      }
      // winner: count desc, then (left, right) asc — the packed key's
      // natural order IS the (left asc, right asc) order for ids >= 0
      var bestKey = -1L
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (k, c) = (e.getKey.longValue(), e.getValue.longValue())
        if (c > bestCnt || (c == bestCnt && k < bestKey)) { bestKey = k; bestCnt = c }
      }
      if (bestCnt < minCount) done = true
      else {
        val l = (bestKey >>> 32).toInt
        val r = (bestKey & 0xFFFFFFFFL).toInt
        merges += ((l, r))
        val mergedId = 256 + round
        types = types
          .map { case (ids, cnt) => (Bpe.applyMerge(ids, l, r, mergedId), cnt) }
          .filter(_._1.length >= 2)
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
