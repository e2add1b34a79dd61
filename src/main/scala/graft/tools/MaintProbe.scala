package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the index_maintenance serve_compacted anomaly
  * (round-11 verdict item 3): replicates Bench's lifecycle at the 10x
  * corpus and instruments what the timing row cannot see — files probed
  * per serve, rows behind those files, bloom bytes per file — plus a
  * REBUILT-FRESH control serve after the compact phase so in-block
  * drift (box/JVM state, not layout) is separable from a real layout
  * regression. Dev tooling; delete after the diagnosis lands in SURVEY.
  */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scale_10x"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("graft_maintprobe")
    val (bandT, sigT) = graft.ext.Dedup.buildMinhashIndexTables(spark,
      s"$tmp/bands", s"$tmp/sigs", corpus, "doc_id", "text",
      filesPerTable = 64)
    val batch = corpus.filter(col("doc_id") % 100 === 7).limit(500)
      .select((col("doc_id") + lit(2000000000L)).as("doc_id"), col("text"))
      .localCheckpoint()

    def serve(): Unit = {
      val r = graft.ext.Dedup.dedupIncrementalFromPairs(
        graft.ext.Dedup.minhashPairsIncrementalIndexed(bandT, sigT, batch,
          "doc_id", "text"), batch, "doc_id", releasePairs = true)
      r.write.format("noop").mode("overwrite").save()
    }
    def time(label: String, n: Int = 3): Double = {
      serve() // warm
      val ts = (0 until n).map { _ =>
        val t0 = System.nanoTime(); serve(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${ts.min}%.3f med=${ts.sorted.apply(n / 2)}%.3f")
      ts.min
    }
    // the serve's actual probe keys (replay of the serve's own first step)
    val g = graft.ext.Dedup.indexGeometryOf(sigT)
    val bKeys = graft.ext.Dedup.bandRows(
        graft.ext.Dedup.minhashSignatures(batch, "doc_id", "text",
          g.shingleSize, g.numHashes, g.seed),
        g.bands, g.numHashes / g.bands)
      .select("bandhash").distinct().collect().map(_.get(0)).toSeq
    def layout(label: String): Unit = {
      val fes = bandT.manifestEntries()
      val probed = bandT.keyProbedManifest("bandhash", bKeys)
      val probedSet = probed.toSet
      val probedRows = fes.filter(f => probedSet(f.path)).map(_.rows).sum
      val bloomBytes = fes.map(_.blooms.flatMap(_.get("bandhash"))
        .map(_.length.toLong).getOrElse(0L))
      val sfes = sigT.manifestEntries()
      println(f"[probe] $label%-28s bandFiles=${fes.size} probed=${probed.size} " +
        f"probedRows=$probedRows totalRows=${fes.map(_.rows).sum} " +
        f"bloomB64/file[min,max]=[${bloomBytes.min},${bloomBytes.max}] " +
        f"sigFiles=${sfes.size} sigRows=${sfes.map(_.rows).sum}")
    }

    layout("fresh"); time("serve_fresh")
    (0 until 8).foreach { b =>
      val app = corpus.filter(col("doc_id") % 100 === b).limit(500)
        .select((col("doc_id") + lit((b + 1) * 10000000L)).as("doc_id"),
          col("text"))
      graft.ext.Dedup.minhashIndexAppend(bandT, sigT, app, "doc_id", "text")
    }
    layout("appended"); time("serve_appended")
    graft.ext.Dedup.compactMinhashIndex(bandT, sigT, filesPerTable = 64)
    layout("compacted"); time("serve_compacted")
    // control: a brand-new fresh build SERVED NOW — if this is also slow,
    // the m2 regression is in-block drift, not the compacted layout
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_maintprobe2")
    val (bandT2, sigT2) = graft.ext.Dedup.buildMinhashIndexTables(spark,
      s"$tmp2/bands", s"$tmp2/sigs", corpus, "doc_id", "text",
      filesPerTable = 64)
    def serve2(): Unit = {
      val r = graft.ext.Dedup.dedupIncrementalFromPairs(
        graft.ext.Dedup.minhashPairsIncrementalIndexed(bandT2, sigT2, batch,
          "doc_id", "text"), batch, "doc_id", releasePairs = true)
      r.write.format("noop").mode("overwrite").save()
    }
    serve2()
    val ts = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); serve2(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] control_fresh_rebuilt       min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
    // and re-time the compacted serve AFTER the control, interleaved
    time("serve_compacted_again")
    spark.stop()
  }
}
