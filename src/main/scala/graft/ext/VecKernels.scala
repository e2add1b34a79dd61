package graft.ext

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * JVM-static vector kernels for the ANN expressions (static forwarders →
 * single static call inside whole-stage codegen, like [[TextHash]]).
 */
object VecKernels {

  /**
   * Indices of the `nProbe` centroids with the highest dot product
   * against `v` (descending; ties by lower index). Centroids are
   * unit-normalized at training time, so ranking by dot ≡ ranking by
   * cosine (|v| is constant across one row's comparisons).
   */
  def nearestLists(v: ArrayData, cents: Array[Array[Float]], nProbe: Int): ArrayData = {
    val k = cents.length
    val d = v.numElements()
    val scores = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      val n = math.min(d, c.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * c(i)
        i += 1
      }
      // NaN (corrupt component) compares false against everything and
      // would otherwise hijack or freeze the selection below
      if (dot.isNaN) dot = Double.NegativeInfinity
      scores(ci) = dot
      ci += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        // NaN scores (corrupt embedding component) compare false against
        // everything; keep the first untaken list as fallback so one bad
        // vector degrades to arbitrary-but-valid probes, not a crash
        if (!taken(j) && (best == -1 || scores(j) > bestScore)) {
          best = j; bestScore = scores(j)
        }
        j += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Product-quantization encode (FAISS IVFPQ residual encoding, Jégou
   * et al. 2011 "Product quantization for nearest neighbor search"):
   * the residual `v − cents(list)` splits into `M = books.length`
   * contiguous subvectors, each replaced by the index of its nearest
   * (L2) codebook entry. One byte per subspace — a 64-dim float vector
   * becomes M=8 bytes, a 32× compression of the stored list payload.
   * Codes are written as unsigned bytes (`ksub ≤ 256`).
   */
  /** Shared geometry guard for [[pqEncode]]/[[pqLut]]: pqTrain only
   *  validates the SAMPLED training vectors, so a corpus row with a
   *  drifted dimension would otherwise truncate (dsub floors away
   *  trailing dims) or zero-pad (out-of-range centroid reads) into
   *  quietly wrong codes/tables. Wrong-silently is the one failure mode
   *  an ANN index cannot surface later — fail the task instead. */
  private def checkPqGeometry(d: Int, centLen: Int, m: Int): Unit = {
    if (d != centLen) throw new IllegalArgumentException(
      s"PQ vector dimension $d != centroid dimension $centLen — " +
        "corpus row does not match the trained index")
    if (m == 0 || d % m != 0) throw new IllegalArgumentException(
      s"PQ vector dimension $d is not divisible into m=$m subspaces")
  }

  def pqEncode(
      v: ArrayData,
      list: Int,
      cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = books.length
    val cent = cents(list)
    val d = v.numElements()
    checkPqGeometry(d, cent.length, m)
    val dsub = d / m
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val book = books(mi)
      val base = mi * dsub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val e = book(j)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val r = v.getFloat(base + i).toDouble - cent(base + i).toDouble
          val diff = r - e(i)
          dist += diff * diff
          i += 1
        }
        // NaN distances (corrupt component) never win; the first finite
        // entry — or entry 0 when all are NaN — stands
        if (dist < bestD) { bestD = dist; bestJ = j }
        j += 1
      }
      out(mi) = bestJ.toByte
      mi += 1
    }
    out
  }

  /**
   * Per-query ADC lookup table for inner-product scoring against a PQ
   * list (the FAISS `compute_distance_table` role): entry
   * `m·ksub + j = dot(q_m, books(m)(j))`, plus one trailing bias slot
   * `dot(q, cents(list))` — so a candidate's approximate inner product
   * is `bias + Σ_m lut[m·ksub + code_m]`, an O(M) sum per candidate
   * instead of the O(D) full dot. Built once per (query, probed list)
   * map-side; the join fan-out only ever sees [[pqAdc]]'s O(M) lookups.
   */
  def pqLut(
      v: ArrayData,
      list: Int,
      cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): ArrayData = {
    val m = books.length
    val d = v.numElements()
    checkPqGeometry(d, cents(list).length, m) // before books(0): m=0 fails loudly
    val ksub = books(0).length
    val dsub = d / m
    val out = new Array[Double](m * ksub + 1)
    var mi = 0
    while (mi < m) {
      val book = books(mi)
      val base = mi * dsub
      var j = 0
      while (j < ksub) {
        val e = book(j)
        var dot = 0.0
        var i = 0
        while (i < dsub) { dot += v.getFloat(base + i).toDouble * e(i); i += 1 }
        out(mi * ksub + j) = dot
        j += 1
      }
      mi += 1
    }
    val cent = cents(list)
    var bias = 0.0
    var i = 0
    while (i < d) { bias += v.getFloat(i).toDouble * cent(i); i += 1 }
    out(m * ksub) = bias
    new GenericArrayData(out)
  }

  /** Approximate inner product of the LUT's query against a PQ-coded
   *  candidate: bias + M table lookups (codes read as unsigned). */
  def pqAdc(lut: ArrayData, codes: Array[Byte]): Double = {
    val m = codes.length
    val ksub = (lut.numElements() - 1) / m
    var s = lut.getDouble(lut.numElements() - 1)
    var mi = 0
    while (mi < m) {
      s += lut.getDouble(mi * ksub + (codes(mi) & 0xFF))
      mi += 1
    }
    s
  }
}
