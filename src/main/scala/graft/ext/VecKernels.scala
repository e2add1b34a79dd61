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
}
