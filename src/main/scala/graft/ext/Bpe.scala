package graft.ext

import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level byte-pair encoding — the GPT-2-family tokenizer algorithm
 * (Sennrich et al. 2016 "Neural machine translation of rare words with
 * subword units"; Radford et al. 2019 byte-level variant), as an
 * executor-side kernel behind the [[BpeEncode]] codegen expression.
 *
 * A trained tokenizer is an ordered MERGES list; this module takes that
 * exported artifact (pairs of piece strings, highest priority first) and
 * runs exact greedy inference:
 *
 *  - base vocabulary = the 256 byte values (ids 0–255), so NO input is
 *    ever out-of-vocabulary — multi-byte UTF-8 just starts as its bytes;
 *  - merge `i` creates the concatenated piece with id `256 + i`;
 *  - encoding a word repeatedly finds the LOWEST-RANK adjacent pair and
 *    merges all its occurrences left-to-right, until no adjacent pair is
 *    in the table — the reference BPE loop;
 *  - documents pre-tokenize on the single-space convention every text
 *    kernel here uses ([[TextHash.spaceTokenCount]]); empty words
 *    contribute no pieces.
 *
 * Scale: the merges table ships INSIDE the expression (id pairs in a
 * long-keyed rank map — one probe per adjacent pair per round), so
 * encoding is one map-side pass per document: no tokenizer service, no
 * join, no shuffle, whatever the corpus size. Per-word cost is
 * O(L · merges applied), L = word byte length.
 */
object Bpe {

  /** Compiled merge table: pair (leftId, rightId) → (rank, mergedId).
   *  Built once on the driver, shipped as one broadcast-referenced
   *  object inside the expression. */
  final class Table private[Bpe] (
      private[Bpe] val ranks: java.util.HashMap[java.lang.Long, java.lang.Integer],
      val size: Int) extends Serializable {
    @inline private[Bpe] def rankOf(a: Int, b: Int): Int = {
      // boxed map on purpose: a primitive-valued scala view would unbox
      // a missing key to rank 0 — every pair would "match" merge 0
      val r = ranks.get((a.toLong << 32) | (b.toLong & 0xFFFFFFFFL))
      if (r == null) Int.MaxValue else r.intValue()
    }
  }

  /** Compile an exported merges list. Each side must resolve to a piece
   *  that already exists at that point (a single byte, or the result of
   *  an EARLIER merge) — the well-formedness every real BPE export has;
   *  violations fail loudly at driver time, not per row. */
  def compile(merges: Seq[(String, String)]): Table = {
    val pieceIds = new java.util.HashMap[String, java.lang.Integer]() // ISO-8859-1-coded bytes → id
    def idOf(piece: String, what: String): Int = {
      val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val key = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (bytes.length == 1) bytes(0) & 0xFF
      else {
        val id = pieceIds.get(key)
        require(id != null,
          s"BPE merge $what side '$piece' is neither a byte nor an earlier merge result")
        id.intValue()
      }
    }
    val ranks = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val (li, ri) = (idOf(l, "left"), idOf(r, "right"))
      val key = java.lang.Long.valueOf((li.toLong << 32) | (ri.toLong & 0xFFFFFFFFL))
      require(!ranks.containsKey(key), s"duplicate BPE merge ('$l', '$r')")
      ranks.put(key, i)
      val mergedKey = new String(
        (l + r).getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      pieceIds.put(mergedKey, 256 + i)
    }
    new Table(ranks, merges.size)
  }

  /** Compile a merges list given directly as piece-ID pairs — the
   *  lossless form [[BpeTrain.train]] produces (merge `i`'s pair ids
   *  must each be a byte or the result of an earlier merge, i.e.
   *  `< 256 + i`). The string form ([[compile]]) is the interchange
   *  format; this one skips the byte↔string round trip, which is only
   *  faithful for ASCII pieces. */
  def compileIds(merges: Seq[(Int, Int)]): Table = {
    val ranks = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l >= 0 && l < 256 + i && r >= 0 && r < 256 + i,
        s"BPE merge $i pair ($l, $r) references an id not yet defined (max ${256 + i - 1})")
      val key = java.lang.Long.valueOf((l.toLong << 32) | (r.toLong & 0xFFFFFFFFL))
      require(!ranks.containsKey(key), s"duplicate BPE merge ($l, $r)")
      ranks.put(key, i)
    }
    new Table(ranks, merges.size)
  }

  /** Render an id-pair merges list as the exported STRING form
   *  [[compile]] accepts — the GPT-2 `merges.txt` interchange format.
   *  Only faithful when every constituent byte is ASCII (a lone byte
   *  ≥ 0x80 is not a valid UTF-8 string, so the round trip through
   *  [[compile]]'s UTF-8 decode would corrupt it); fails loudly
   *  otherwise — use [[compileIds]] for raw-byte vocabularies. */
  def renderMerges(merges: Seq[(Int, Int)]): Seq[(String, String)] = {
    val pieces = new java.util.HashMap[Integer, String]()
    def pieceOf(id: Int, i: Int): String =
      if (id < 256) {
        require(id < 128,
          s"BPE merge $i references non-ASCII byte $id; string export cannot " +
            "represent it — persist the id pairs and use compileIds instead")
        new String(Array(id.toByte), java.nio.charset.StandardCharsets.UTF_8)
      } else {
        val p = pieces.get(id)
        require(p != null, s"BPE merge $i references undefined id $id")
        p
      }
    merges.zipWithIndex.map { case ((l, r), i) =>
      val (ls, rs) = (pieceOf(l, i), pieceOf(r, i))
      pieces.put(256 + i, ls + rs)
      (ls, rs)
    }
  }

  /** Replace every left-to-right non-overlapping occurrence of the
   *  adjacent pair `(l, r)` in `ids` with `mergedId` — the single-round
   *  training-side counterpart of [[encodeWord]]'s merge step, applied
   *  to the word-TYPE table each round of [[BpeTrain.train]]. Returns
   *  `ids` itself when the pair does not occur; when it does, the input
   *  array's prefix is clobbered as scratch (callers pass owned
   *  arrays). */
  def applyMerge(ids: Array[Int], l: Int, r: Int, mergedId: Int): Array[Int] = {
    val n = ids.length
    var w = 0
    var i = 0
    var changed = false
    while (i < n) {
      if (i < n - 1 && ids(i) == l && ids(i + 1) == r) {
        ids(w) = mergedId; i += 2; changed = true
      } else {
        ids(w) = ids(i); i += 1
      }
      w += 1
    }
    if (!changed) ids
    else java.util.Arrays.copyOf(ids, w)
  }

  /** A string's UTF-8 bytes as base piece ids 0–255 (array<int>) — the
   *  byte-level BPE starting state ([[Utf8Bytes]] codegen kernel). */
  def utf8Ids(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xFF; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[applyMerge]] in the Catalyst array representation (the
   *  [[BpeApplyMerge]] codegen kernel). */
  def applyMergeData(
      ids: org.apache.spark.sql.catalyst.util.ArrayData,
      l: Int, r: Int, mergedId: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val arr = ids.toIntArray()
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(applyMerge(arr, l, r, mergedId))
  }

  /** Encode ONE word already materialized as piece ids in
   *  `ids[off, off+n0)`; returns the encoded length (ids compact in
   *  place at `off`). */
  private def encodeWord(ids: Array[Int], off: Int, n0: Int, table: Table): Int = {
    var n = n0
    while (n > 1) {
      // find the lowest-rank adjacent pair type
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = table.rankOf(ids(off + i), ids(off + i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return n
      val mergedId = 256 + best
      // merge all occurrences of that pair left-to-right
      var w = 0
      i = 0
      while (i < n) {
        if (i < n - 1 && table.rankOf(ids(off + i), ids(off + i + 1)) == best) {
          ids(off + w) = mergedId; i += 2
        } else {
          ids(off + w) = ids(off + i); i += 1
        }
        w += 1
      }
      n = w
    }
    n
  }

  /** Encode a whole document: split on 0x20, BPE each word, concatenate
   *  piece ids. One pass; primitive buffers only — the per-document
   *  output can never exceed the byte length, so the output buffer is
   *  sized once and trimmed at the end (no boxing, no growth churn in
   *  the map-side hot path). */
  def encodeDoc(s: UTF8String, table: Table): Array[Int] = {
    val bytes = s.getBytes // materialized once; words re-slice it
    val out = new Array[Int](bytes.length) // ids per word ≤ word bytes
    var w = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        val len = i - start
        if (len > 0) {
          var j = 0
          while (j < len) { out(w + j) = bytes(start + j) & 0xFF; j += 1 }
          w += encodeWord(out, w, len, table)
        }
        start = i + 1
      }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** [[encodeDoc]] in the Catalyst array representation — the form the
   *  [[BpeEncode]] codegen calls. */
  def encodeDocData(s: UTF8String, table: Table): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encodeDoc(s, table))
}
