package graft.ext

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JVM-static hash kernels for the text/dedup expressions. A top-level
 * Scala object emits static forwarders, so generated code can call
 * `graft.ext.TextHash.simhash64(x)` directly — one static call per row,
 * no boxing, fully whole-stage-codegen compatible.
 *
 * All hashing is xxHash64 (Spark's own [[XXH64]]), so results are
 * deterministic across JVMs, partitions, and runs — a requirement for
 * dedup keys that must agree between a 1000-executor cluster run and a
 * re-run (reference formats' checksum role, `hudi/hudi_scd_script.py:63`).
 */
object TextHash {

  final val DefaultSeed = 42L

  def xxh64(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** 64-bit rolling polynomial fingerprint over UTF-8 bytes (document
   *  identity hash; order-sensitive, unlike the bag-of-tokens simhash). */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      i += 1
    }
    h
  }

  /** SimHash over a token array: per-token xxh64, per-bit majority vote.
   *  Near-identical token multisets → small Hamming distance. Null tokens
   *  are skipped. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = xxh64(tokens.getUTF8String(i), DefaultSeed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** MinHash signature: for hash function i, min over tokens of
   *  `a_i * xxh64(token) + b_i` (odd multipliers from the seed stream).
   *  Estimated Jaccard of two docs = fraction of equal components. */
  /** (a_i, b_i) coefficient arrays per (numHashes, seed) — pure
   *  functions of the parameters, cached so the hot loop does not
   *  rebuild 2*numHashes hashes per ROW. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  private def coeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { case (n, sd) =>
      val as = new Array[Long](n)
      val bs = new Array[Long](n)
      var i = 0
      while (i < n) {
        as(i) = XXH64.hashLong(2L * i, sd) | 1L
        bs(i) = XXH64.hashLong(2L * i + 1, sd)
        i += 1
      }
      (as, bs)
    })

  def minhash(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(numHashes, seed)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = xxh64(tokens.getUTF8String(t), seed)
        var k = 0
        while (k < numHashes) {
          val v = as(k) * h + bs(k)
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** [[minhash]] over PRE-HASHED elements (array<long>, e.g.
   *  [[hashedShingles]] output) — skips the per-string xxh64. */
  def minhashLongs(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(numHashes, seed)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      val h = hashes.getLong(t)
      var k = 0
      while (k < numHashes) {
        val v = as(k) * h + bs(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /**
   * Sorted distinct 64-bit hashes of the word `n`-gram shingles of `s` —
   * tokenize (single-space, `split(text, " ")` semantics incl. empty
   * tokens), hash each token span straight off the UTF-8 bytes, chain
   * `n` consecutive token hashes per shingle, sort + dedupe. One pass,
   * ZERO string allocation — the shingling cost per input byte is what
   * survives a 100 TB corpus scan. A shingle's chained hash is bijective
   * to its token sequence modulo 64-bit collisions (~|shingles|²/2⁶⁴ per
   * doc — negligible), so set operations over these hashes reproduce
   * exact string-shingle Jaccard.
   */
  def hashedShingles(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    val nSh = nTok - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 0x20) {
        th(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, seed)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nSh)
    var w = 0
    while (w < nSh) {
      var h = seed
      var k = 0
      while (k < n) {
        h = XXH64.hashLong(th(w + k), h)
        k += 1
      }
      out(w) = h
      w += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var j = 1
    while (j < nSh) {
      if (out(j) != out(m)) { m += 1; out(m) = out(j) }
      j += 1
    }
    new GenericArrayData(
      if (m + 1 == nSh) out else java.util.Arrays.copyOf(out, m + 1))
  }

  /** POSITIONAL gram hashes: one 64-bit hash per n-token window in
   *  document order — [[hashedShingles]] without the sort/dedup tail,
   *  for operators that need (position, gram) occurrences (duplicated-
   *  span mining) rather than a shingle set. Same zero-allocation
   *  byte-level kernel: tokens hash in one pass over the UTF-8 bytes,
   *  windows chain the token hashes; no token strings, no gram strings,
   *  no java-regex. Shorter-than-n documents return an empty array. */
  def positionalGramHashes(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    val nSh = nTok - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 0x20) {
        th(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, seed)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](nSh)
    var w = 0
    while (w < nSh) {
      var h = seed
      var k = 0
      while (k < n) {
        h = XXH64.hashLong(th(w + k), h)
        k += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /** ASCII classification for [[punctCount]]: true = the byte is a
   *  letter, digit, or whitespace (java-regex `\s` = [ \t\n\x0B\f\r]) —
   *  i.e. NOT punctuation. Table lookup keeps the hot loop branchless. */
  private val asciiNonPunct: Array[Boolean] = {
    val t = new Array[Boolean](128)
    var c = 'a'; while (c <= 'z') { t(c) = true; c = (c + 1).toChar }
    c = 'A'; while (c <= 'Z') { t(c) = true; c = (c + 1).toChar }
    c = '0'; while (c <= '9') { t(c) = true; c = (c + 1).toChar }
    Seq(' ', '\t', '\n', 0x0B.toChar, '\f', '\r').foreach(w => t(w) = true)
    t
  }

  /** True iff the (non-ASCII) code point is neither a Unicode letter
   *  (categories L*) nor a Unicode number (Nd/Nl/No) — the complement of
   *  java-regex `[\p{L}\p{N}]`. Non-ASCII whitespace (e.g. U+00A0) is NOT
   *  `\s` in java/RE2 default mode, so it counts as punctuation here,
   *  exactly like the regex it replaces. */
  private def isPunctCodePoint(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t != Character.UPPERCASE_LETTER && t != Character.LOWERCASE_LETTER &&
      t != Character.TITLECASE_LETTER && t != Character.MODIFIER_LETTER &&
      t != Character.OTHER_LETTER && t != Character.DECIMAL_DIGIT_NUMBER &&
      t != Character.LETTER_NUMBER && t != Character.OTHER_NUMBER
  }

  /**
   * Number of code points matching java-regex `[^\p{L}\p{N}\s]` — the
   * punctuation/symbol count of the quality-ratio family. Semantically
   * `length(regexp_replace(s, "[\\p{L}\\p{N}\\s]", ""))`, but a single
   * pass over the UTF-8 bytes with ZERO allocation: no Matcher, no
   * StringBuilder, no rewritten copy of the document — the difference
   * between a map-stage and a multiple of the corpus scan cost at 100 TB.
   * ASCII bytes classify via table lookup; multi-byte sequences decode
   * inline and classify via `Character.getType`. Malformed trailing
   * sequences count as one punctuation code point per byte (regex
   * engines never see them; parquet strings are valid UTF-8 in practice).
   */
  def punctCount(s: UTF8String): Int = {
    val nb = s.numBytes()
    var i = 0
    var cnt = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b & 0x80) == 0) {
        if (!asciiNonPunct(b)) cnt += 1
        i += 1
      } else {
        val len = UTF8String.numBytesForFirstByte(b)
        if (len <= 1 || i + len > nb) { cnt += 1; i += 1 }
        else {
          var cp = len match {
            case 2 => b & 0x1F
            case 3 => b & 0x0F
            case _ => b & 0x07
          }
          var k = 1
          while (k < len) {
            cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
            k += 1
          }
          if (isPunctCodePoint(cp)) cnt += 1
          i += len
        }
      }
    }
    cnt
  }

  /** `size(split(s, " "))` without materializing the token array: the
   *  single-space tokenizer yields exactly (number of 0x20 bytes) + 1
   *  tokens (empty tokens included, split's limit=-1 semantics). One
   *  byte scan, zero allocation. */
  def spaceTokenCount(s: UTF8String): Int = {
    val nb = s.numBytes()
    var i = 0
    var spaces = 0
    while (i < nb) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    spaces + 1
  }

  /**
   * Number of single-space-delimited tokens of `s` that equal one of the
   * `stopwords` (each an UTF-8 byte array) — the numerator of
   * [[graft.ext.TextAnalysis.stopwordRatio]]. Replaces a
   * `filter(split(text," "), t => array_contains(...))` lambda chain
   * (token-array allocation + per-token UTF8String boxing) with one byte
   * scan: token spans compare length-first against the (small) stopword
   * table, bytes only on a length hit. Exact — no hashing involved.
   */
  /**
   * Σ weight(token) over the single-space-separated tokens of `s`
   * against a vocabulary shipped as parallel arrays: `hashes` holds the
   * ASC-sorted xxHash64 of each vocab token's bytes, `weights` the
   * aligned weight. One binary search per token — O(log V) with zero
   * allocation, so a 10⁶-entry exported model (fastText / logistic
   * regression) scores documents map-side inside whole-stage codegen.
   * 64-bit hash collisions are the usual negligible trade.
   */
  def tokenWeightSum(
      s: UTF8String,
      hashes: Array[Long],
      weights: Array[Double],
      seed: Long): Double = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var sum = 0.0
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, seed)
        val k = java.util.Arrays.binarySearch(hashes, h)
        if (k >= 0) sum += weights(k)
        start = i + 1
      }
      i += 1
    }
    sum
  }

  def stopwordHits(s: UTF8String, stopwords: Array[Array[Byte]]): Int = {
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cnt = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || s.getByte(i) == 0x20) {
        val len = i - start
        var k = 0
        var hit = false
        while (!hit && k < stopwords.length) {
          val w = stopwords(k)
          if (w.length == len &&
            org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
              base, off + start, w, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len.toLong)) {
            hit = true
          }
          k += 1
        }
        if (hit) cnt += 1
        start = i + 1
      }
      i += 1
    }
    cnt
  }

  /** Cosine similarity of two float vectors, accumulated in double,
   *  sequential order (matches columnar engines' scalar loops). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = checkedDim(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Mixed-dimension inputs (embeddings from different models in one
   *  table) must fail loudly — truncating to the shorter vector would
   *  return a plausible-looking but meaningless similarity. Zero-norm
   *  vectors score 0.0 (not NaN, which silently fails every threshold). */
  private def checkedDim(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) throw new IllegalArgumentException(
      s"cosine_similarity: dimension mismatch ($na vs $nb)")
    na
  }

  /** Cosine similarity of two double vectors. */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = checkedDim(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * Symmetric int8 scalar quantization of a float vector: per-vector
   * scale = maxAbs/127, code_i = clamp(floor(x_i/scale + 0.5), ±127) —
   * the standard 4× memory/bandwidth reduction for embedding corpora
   * (an int8 FAISS/SQ8 code layout). Rounding is spelled
   * `floor(x + 0.5)` (not `Math.round`'s half-up on longs or banker's
   * `rint`) so ANY engine with floor replays the codes bit-exactly —
   * the oracle-portability rule the deterministic-sampling hashes
   * follow. An all-zero (or zero-scale) vector quantizes to all-zero
   * codes rather than dividing by zero.
   */
  def int8CodesF(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    if (maxAbs == 0.0) return out
    val scale = maxAbs / 127.0
    i = 0
    while (i < n) {
      val q = math.floor(v.getFloat(i).toDouble / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  /** [[int8CodesF]] for array<double> input. */
  def int8CodesD(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    if (maxAbs == 0.0) return out
    val scale = maxAbs / 127.0
    i = 0
    while (i < n) {
      val q = math.floor(v.getDouble(i) / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  /**
   * Cosine similarity of two int8 code vectors. The per-vector scales
   * CANCEL in the cosine — cos(s_a·q_a, s_b·q_b) = (q_a·q_b)/(‖q_a‖‖q_b‖)
   * — so the kernel is a pure integer dot/norm accumulation (the
   * SIMD-able hot loop of quantized ANN; 64-dim worst case |dot| ≤
   * 64·127² ≪ 2⁵³, exact in the final double conversion). Zero-norm
   * codes score 0.0, dimension mismatch fails loudly ([[checkedDim]]
   * contract).
   */
  def int8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length != b.length) throw new IllegalArgumentException(
      s"int8_cosine: dimension mismatch (${a.length} vs ${b.length})")
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Intersection size of two string arrays that are BOTH sorted ascending
   *  (binary/UTF8 order, e.g. via `sort_array`): one merge scan, O(n+m)
   *  byte comparisons — the verification kernel for similarity joins
   *  (array_intersect would hash-build per row). Inputs with duplicate
   *  elements count each matching run once (set semantics). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      // null elements (sort_array puts them first) match nothing
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) {
        cnt += 1
        // skip duplicate runs on both sides (set semantics)
        i += 1; j += 1
        while (i < na && a.getUTF8String(i).compareTo(x) == 0) i += 1
        while (j < nb && b.getUTF8String(j).compareTo(y) == 0) j += 1
      } else if (c < 0) i += 1
      else j += 1
      }
    }
    cnt
  }

  /** [[sortedIntersectCount]] for ASC-sorted long arrays — the
   *  hashed-shingle verification path (no byte comparisons at all). */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      // null slots read as 0 and would count spurious 0==0 matches
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        cnt += 1
        i += 1; j += 1
        while (i < na && a.getLong(i) == x) i += 1
        while (j < nb && b.getLong(j) == y) j += 1
      } else if (x < y) i += 1
      else j += 1
      }
    }
    cnt
  }

  /** Random-hyperplane LSH bucket for a float vector: bit i = sign of the
   *  dot product with a deterministic ±1 hyperplane derived from
   *  xxh64(plane, dim). Cosine-similar vectors land in equal/near buckets. */
  /** planes x d ±1 sign matrix per (planes, seed, d) — row-independent,
   *  cached: rebuilding planes*d hashes per ROW dominated the kernel. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long, Int), Array[Double]]()
  private def signs(planes: Int, seed: Long, d: Int): Array[Double] =
    signCache.computeIfAbsent((planes, seed, d), { case (p0, sd, dim) =>
      val m = new Array[Double](p0 * dim)
      var p = 0
      while (p < p0) {
        var i = 0
        while (i < dim) {
          m(p * dim + i) =
            if ((XXH64.hashLong(p.toLong * 1000003L + i, sd) & 1L) == 0L) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      m
    })

  def hyperplaneBucketF(v: ArrayData, planes: Int, seed: Long): Long = {
    // 1..64: a shift past 63 wraps mod 64 and silently corrupts buckets;
    // 0 planes would put the whole corpus in one quadratic bucket
    require(planes >= 1 && planes <= 64, s"planes must be in 1..64, got $planes")
    val d = v.numElements()
    val m = signs(planes, seed, d)
    var out = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      val base = p * d
      while (i < d) {
        dot += m(base + i) * v.getFloat(i)
        i += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  // ---- Johnson–Lindenstrauss random projection (Similarity.randomProjection)
  // Arithmetic contract (externally replayed by the q74 oracle): sign
  // (j, i) = +1 iff two rounds of the portable BIGINT multiplicative
  // hash on index j·stride + i land below Modulus/2; accumulation is
  // LEFT-TO-RIGHT in double; result scaled by 1.0/√outDim. Any change
  // here must change the oracle and Sampling.hashBucket together.
  private val ProjModulus = 1000000007L
  private val ProjMult = 2654435761L

  private def projSign(idx: Long, salt: Long): Boolean = {
    val reduced = java.lang.Math.floorMod(idx, ProjModulus)
    val r1 = java.lang.Math.floorMod(reduced * ProjMult + salt, ProjModulus)
    val r2 = java.lang.Math.floorMod(r1 * ProjMult + salt, ProjModulus)
    r2 < ProjModulus / 2
  }

  private def randomProject(
      v: ArrayData, getD: Int => Double, anyNull: Boolean,
      outDim: Int, salt: Long, stride: Long): ArrayData = {
    val out = new Array[Any](outDim)
    if (anyNull) return new GenericArrayData(out) // all-null row (HOF parity)
    val d = v.numElements()
    if (d >= stride) throw new IllegalArgumentException(
      s"random_projection: input dimension $d must be < $stride (index stride)")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j.toLong * stride
      var i = 0
      while (i < d) {
        val x = getD(i)
        acc += (if (projSign(base + i, salt)) x else -x)
        i += 1
      }
      out(j) = acc * scale
      j += 1
    }
    new GenericArrayData(out)
  }

  private def hasNullElement(v: ArrayData): Boolean = {
    var i = 0
    val n = v.numElements()
    while (i < n) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  def randomProjectF(v: ArrayData, outDim: Int, salt: Long, stride: Long): ArrayData =
    randomProject(v, i => v.getFloat(i).toDouble, hasNullElement(v), outDim, salt, stride)

  def randomProjectD(v: ArrayData, outDim: Int, salt: Long, stride: Long): ArrayData =
    randomProject(v, i => v.getDouble(i), hasNullElement(v), outDim, salt, stride)
}
