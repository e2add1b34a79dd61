package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Synthesizes a larger documents/embeddings corpus with the SAME
 * generative shape as the driver's `/root/testdata` fixtures (word-salad
 * text over a small vocabulary, ~10% of docs carrying a planted shared
 * span, sparse exact/near duplicate pairs, 64-d cluster-structured
 * embeddings) — the scaling UPPER measurement point for the pair-mining
 * queries (q21/q48/q62/q71), where the sf0.01→sf0.1 step is dominated by
 * fixed job overhead and says little about the work exponent.
 *
 * Fully deterministic: every value derives from splitmix64 of (row id,
 * stream) — no RNG state, so regeneration is bit-identical and executors
 * need no coordination. Used by [[graft.Bench]] when
 * `SPARK_GRAFT_SCALING_HI` is unset but the default corpus dir exists or
 * can be created.
 */
object ScaleCorpus {

  val DefaultDir = "/tmp/graft_scale_10x"
  val DefaultDocs = 50000   // 10x the sf0.1 documents table
  val DefaultVecs = 20000   // 10x the sf0.1 embeddings table

  // 100x point (round-10 scale stress): another 10x on top of the 10x
  // corpus — 500k docs / 200k vectors, the largest corpus the 128 GiB
  // sandbox holds comfortably while still being a true decade step.
  val Dir100x = "/tmp/graft_scale_100x"
  val Docs100x = 500000
  val Vecs100x = 200000

  // Dense-duplicate corpus: documents arranged in cliques of
  // `DenseClique` one-word-perturbed variants, so minhash-LSH mining
  // yields ~C(k, 2) confirmed pairs per clique. At `DenseHiDocs` the
  // mined edge set exceeds the 2^20-edge driver union-find threshold
  // (48000/64 = 750 cliques x 2016 pairs ~ 1.5M edges), which is the
  // point: the PRODUCTION dispatch of [[graft.ext.Dedup.connectedComponents]]
  // must take the distributed large-star/small-star path there.
  val DenseLoDir = "/tmp/graft_scale_dense_lo"
  val DenseHiDir = "/tmp/graft_scale_dense_hi"
  val DenseLoDocs = 4800
  val DenseHiDocs = 48000
  val DenseClique = 64

  // Rich-lexicon corpus for production-vocabulary BPE: the default
  // corpus draws from a 27-word vocabulary, whose byte-pair space
  // exhausts after a few hundred merges — useless for evidencing a
  // ~32k-merge tokenizer. This one draws pseudo-words from a 2^17-entry
  // deterministic lexicon with a sqrt-skewed frequency curve, so every
  // lexicon word appears with count >= 2 and the merge space supports
  // tens of thousands of rounds.
  val RichDir = "/tmp/graft_scale_rich"
  val RichDocs = 100000
  val LexSize = 1 << 17

  private val vocab: Array[String] = Array(
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "batch", "part", "vector", "query", "agg", "table", "hash",
    "the", "stream", "filter", "big", "merge", "group", "join",
    "customer", "slow", "key", "a")
  private val langs = Array("en", "en", "en", "zh", "fr", "de", "es")

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def word(h: Long): String = vocab(math.floorMod(h, vocab.length).toInt)

  /** One of 40 fixed 12–18 word spans — the shared-span plant q62/q71 mine. */
  private def span(k: Long): Seq[String] = {
    val id = math.floorMod(k, 40L)
    val len = 12 + math.floorMod(mix(id, 7), 7L).toInt
    (0 until len).map(j => word(mix(id * 131, j + 1000)))
  }

  private def docText(id: Long): String = {
    val exactDupOf = if (id > 0 && math.floorMod(id, 2500L) == 2499L) Some(id - 1) else None
    val nearDupOf = if (id > 0 && math.floorMod(id, 500L) == 499L && exactDupOf.isEmpty)
      Some(id - 1) else None
    val base = exactDupOf.orElse(nearDupOf).getOrElse(id)
    val len = 8 + math.floorMod(mix(base, 1), 93L).toInt
    var words = (0 until len).map(j => word(mix(base, j + 10)))
    if (math.floorMod(mix(base, 2), 10L) == 0L) { // ~10% carry a planted span
      val at = math.floorMod(mix(base, 4), (len + 1).toLong).toInt
      val (pre, post) = words.splitAt(at)
      words = pre ++ span(mix(base, 3)) ++ post
    }
    if (nearDupOf.isDefined) { // one-word perturbation: high-jaccard pair
      val at = math.floorMod(mix(id, 5), words.length.toLong).toInt
      words = words.updated(at, word(mix(id, 6)))
    }
    words.mkString(" ")
  }

  def documents(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n).as[Long].map { id =>
      val text = docText(id)
      (id, text, langs(math.floorMod(mix(id, 20), langs.length).toInt),
        s"src${math.floorMod(mix(id, 21), 10L)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, n: Int, dim: Int = 64): DataFrame = {
    import spark.implicits._
    // labels are arbitrary over ISOTROPIC unit vectors, matching the
    // driver fixture (measured within-label avg cosine ≈ 0.003): tight
    // planted clusters would flood every LSH bucket with same-cluster
    // candidates and measure bucket skew, not corpus scaling
    spark.range(0, n).as[Long].map { id =>
      val v = Array.tabulate(dim) { d =>
        (math.floorMod(mix(id, d + 5000), 2001L) - 1000L) / 1000.0f
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat max 1e-6f
      (id, v.map(_ / norm), math.floorMod(id, 10L).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Clique-structured near-duplicate text: clique `id / cliqueSize`,
   *  each member a one-word perturbation of the clique base — pairwise
   *  shingle Jaccard stays far above the 0.5 mining threshold, so LSH
   *  banding recovers (nearly) the full clique pair set. */
  private def denseText(id: Long, cliqueSize: Int): String = {
    val clique = id / cliqueSize
    val member = math.floorMod(id, cliqueSize.toLong)
    val len = 40 + math.floorMod(mix(clique, 30), 31L).toInt // 40-70 words
    var words = (0 until len).map(j => word(mix(clique, j + 40)))
    if (member > 0) { // base member 0 stays pristine
      val at = math.floorMod(mix(id, 31), len.toLong).toInt
      words = words.updated(at, word(mix(id, 32)))
    }
    words.mkString(" ")
  }

  def denseDocuments(spark: SparkSession, n: Int,
      cliqueSize: Int = DenseClique): DataFrame = {
    import spark.implicits._
    spark.range(0, n).as[Long].map { id =>
      (id, denseText(id, cliqueSize))
    }.toDF("doc_id", "text")
  }

  /** Pseudo-word `w` of the rich lexicon: 3-10 lowercase letters, fully
   *  determined by the lexicon index. */
  private def richWord(w: Long): String = {
    val len = 3 + math.floorMod(mix(w, 900), 8L).toInt
    val sb = new java.lang.StringBuilder(len)
    var j = 0
    while (j < len) {
      sb.append(('a' + math.floorMod(mix(w, 901 + j), 26L).toInt).toChar)
      j += 1
    }
    sb.toString
  }

  /** Rich-lexicon text: 30-80 word docs, lexicon index drawn with a
   *  u^2 skew (head words very frequent, tail still covered — with
   *  RichDocs x ~55 draws every lexicon entry is expected ~20 times,
   *  so minCount=2 never starves BPE training early). */
  private def richText(id: Long): String = {
    val len = 30 + math.floorMod(mix(id, 902), 51L).toInt
    (0 until len).map { j =>
      val u = math.floorMod(mix(id, 910 + j), 1L << 20).toDouble / (1L << 20)
      richWord((u * u * LexSize).toLong min (LexSize - 1))
    }.mkString(" ")
  }

  def richDocuments(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n).as[Long].map(id => (id, richText(id))).toDF("doc_id", "text")
  }

  /** Idempotent: a dir that already holds both tables is left untouched. */
  def ensure(spark: SparkSession, dir: String = DefaultDir,
      docs: Int = DefaultDocs, vecs: Int = DefaultVecs): Boolean = {
    val d = new java.io.File(dir)
    val docsP = new java.io.File(d, "documents.parquet")
    val vecsP = new java.io.File(d, "embeddings.parquet")
    if (docsP.isDirectory && vecsP.isDirectory) return true
    try {
      documents(spark, docs).repartition(if (docs > 100000) 32 else 8)
        .write.mode("overwrite").parquet(docsP.getPath)
      embeddings(spark, vecs).repartition(if (vecs > 50000) 32 else 8)
        .write.mode("overwrite").parquet(vecsP.getPath)
      true
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-corpus] generation failed: ${e.getMessage}")
        false
    }
  }

  /** Idempotent single-table variant for the dense/rich corpora. */
  def ensureDocs(spark: SparkSession, dir: String,
      gen: => DataFrame): Boolean = {
    val docsP = new java.io.File(new java.io.File(dir), "documents.parquet")
    if (docsP.isDirectory) return true
    try {
      gen.repartition(16).write.mode("overwrite").parquet(docsP.getPath)
      true
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scale-corpus] generation failed for $dir: ${e.getMessage}")
        false
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(DefaultDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"generated=${ensure(spark, dir)} dir=$dir")
    spark.stop()
  }
}
