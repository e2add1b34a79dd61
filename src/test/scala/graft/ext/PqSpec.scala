package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ (product quantization): codebook training determinism, the
 *  encode/LUT/ADC kernel contract, recall of planted duplicates, the
 *  refine stage, and index persistability. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val M = 4
  private val Shift = 1000L

  /** Deterministic pseudo-random vector for id `i` (values in [-1, 1]). */
  private def vec(i: Long): Array[Float] = Array.tabulate(Dim) { j =>
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i * 131 + j, 42L)
    ((h % 1000L).toDouble / 500.0 - 1.0).toFloat
  }

  private def corpus(n: Int): DataFrame = {
    val base = (0 until n).map(i => (i.toLong, vec(i.toLong)))
    // planted exact copies at id + Shift
    (base ++ base.map { case (i, v) => (i + Shift, v) }).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
  }

  test("pqTrain: deterministic, shaped M x ksub x d/M") {
    val c = corpus(40)
    val a = Similarity.pqTrain(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val b = Similarity.pqTrain(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    assert(a.books.length === M)
    assert(a.books.forall(_.length === 8))
    assert(a.books.forall(_.forall(_.length === Dim / M)))
    assert(a.cents.length === 4)
    (a.books.flatten[Array[Float]] zip b.books.flatten[Array[Float]]).foreach {
      case (x, y) => assert(x.toSeq === y.toSeq)
    }
  }

  test("identical vectors assign to the same list with identical codes") {
    val c = corpus(40)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val rows = idx.assigned.select("n_id", "list", "n_codes").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    (0L until 40L).foreach { i =>
      assert(rows(i) === rows(i + Shift), s"id $i vs its planted copy")
      assert(rows(i)._2.length === M)
    }
  }

  test("ADC score equals the driver-replayed reconstruction inner product") {
    val c = corpus(30)
    val model = Similarity.pqTrain(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val probes = c.filter(col("id") < 5)
    val got = Similarity.ivfProbePq(idx, probes, "id", "vec",
      k = 1000, nProbe = 4).collect()
    val codes = idx.assigned.collect()
      .map(r => r.getAs[Long]("n_id") -> ((r.getAs[Int]("list"), r.getAs[Array[Byte]]("n_codes"))))
      .toMap
    val dsub = Dim / M
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = vec(r.getAs[Long]("q_id"))
      val (list, code) = codes(r.getAs[Long]("n_id"))
      // recon = coarse centroid + per-subspace codebook entries
      val recon = new Array[Double](Dim)
      val cent = model.cents(list)
      var i = 0
      while (i < Dim) { recon(i) = if (i < cent.length) cent(i).toDouble else 0.0; i += 1 }
      for (mi <- 0 until M; j <- 0 until dsub)
        recon(mi * dsub + j) += model.books(mi)(code(mi) & 0xFF)(j)
      val expected = (0 until Dim).map(i => q(i).toDouble * recon(i)).sum
      assert(math.abs(r.getAs[Double]("adc") - expected) < 1e-9,
        s"adc mismatch for (${r.getAs[Long]("q_id")}, ${r.getAs[Long]("n_id")})")
    }
  }

  test("exhaustive ADC probing recalls the planted copy within the refine budget") {
    // ADC is approximate — on near-random vectors the copy's score
    // dot(q, recon(q)) loses quantization energy while a lucky
    // background candidate can gain it, so top-1 is NOT guaranteed
    // (that is the refine stage's job). The structural contract of the
    // compressed index is candidate RECALL: the copy must survive into
    // the top-`refine` ADC candidates.
    val c = corpus(60)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 16)
    val probes = c.filter(col("id") < 20)
    val cand = Similarity.ivfProbePq(idx, probes, "id", "vec", k = 20, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    (0L until 20L).foreach { i =>
      assert(cand.contains((i, i + Shift)),
        s"probe $i: its exact copy must be within the ADC top-20 candidates")
    }
  }

  test("refine stage: exact re-rank over ADC candidates, cosine 1.0 for copies") {
    val c = corpus(60)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 16)
    val probes = c.filter(col("id") < 10)
    val rows = Similarity.ivfProbePqRefined(idx, c, probes, "id", "vec",
      k = 1, nProbe = 4, refine = 20)
      .select("q_id", "n_id", "cos").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_id") === r.getAs[Long]("q_id") + Shift)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    }
  }

  test("index persists: parquet-roundtripped frames probe identically") {
    val c = corpus(40)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val dir = tmpDir("pq-index")
    idx.centroids.write.mode("overwrite").parquet(s"$dir/cents")
    idx.codebooks.write.mode("overwrite").parquet(s"$dir/books")
    idx.assigned.write.mode("overwrite").parquet(s"$dir/assigned")
    val back = Similarity.IvfIndexPq(
      spark.read.parquet(s"$dir/cents"),
      spark.read.parquet(s"$dir/books"),
      spark.read.parquet(s"$dir/assigned"))
    val probes = c.filter(col("id") < 5)
    val a = Similarity.ivfProbePq(idx, probes, "id", "vec", k = 3, nProbe = 4)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    val b = Similarity.ivfProbePq(back, probes, "id", "vec", k = 3, nProbe = 4)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(a === b)
  }

  test("pqEncode/pqLut reject dimension drift instead of truncating") {
    // pqTrain only validates the SAMPLED training vectors — a corpus row
    // whose dimension drifted from the trained index must fail the task,
    // not silently floor into dsub-truncated codes or zero-padded LUTs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = Array(Array.fill(Dim)(0f))
    val books = Array.fill(M)(Array.fill(8)(Array.fill(Dim / M)(0f)))
    val short = new GenericArrayData(Array.fill(Dim - 1)(0f))
    val okLen = new GenericArrayData(Array.fill(Dim)(0f))
    assert(intercept[IllegalArgumentException](
      VecKernels.pqEncode(short, 0, cents, books)).getMessage.contains("dimension"))
    assert(intercept[IllegalArgumentException](
      VecKernels.pqLut(short, 0, cents, books)).getMessage.contains("dimension"))
    // d not divisible into m subspaces is caught even when lengths agree
    val cents6 = Array(Array.fill(6)(0f))
    val v6 = new GenericArrayData(Array.fill(6)(0f))
    assert(intercept[IllegalArgumentException](
      VecKernels.pqEncode(v6, 0, cents6, books)).getMessage.contains("subspace"))
    VecKernels.pqEncode(okLen, 0, cents, books) // matched geometry passes
    // and through the expression path: a drifted corpus row fails encode
    val c = corpus(30)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val drifted = c.unionByName(
      Seq((9999L, Array.fill(Dim - 1)(0.5f))).toDF("id", "vec")
        .select(col("id"), col("vec").cast("array<float>").as("vec")))
    val e = intercept[Exception] {
      Similarity.ivfAssignPq(idx.centroids, idx.codebooks, drifted, "id", "vec")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.isInstanceOf[IllegalArgumentException]))
  }

  test("incremental assign: re-encoding the corpus reproduces the stored lists") {
    val c = corpus(30)
    val idx = Similarity.ivfBuildPq(c, "id", "vec", nlist = 4, m = M, ksub = 8)
    val again = Similarity.ivfAssignPq(idx.centroids, idx.codebooks, c, "id", "vec")
    val a = idx.assigned.select("list", "n_id", "n_codes").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).sortBy(_._2).toSeq
    val b = again.select("list", "n_id", "n_codes").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).sortBy(_._2).toSeq
    assert(a === b)
  }
}
