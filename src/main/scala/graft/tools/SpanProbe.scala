package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for q71's 100x exponent (round-11 verdict item 2):
  * times the candidate stages of removeDuplicatedSpans separately at the
  * 10x and 100x corpora, with a fixed-work calib probe around each
  * point, so the residual slope is attributable to a stage (code) or to
  * the box (calib moved too). Dev tooling; delete after the diagnosis.
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def calib(): Double = {
      // single-thread fixed CPU loop (matches Bench's probe intent)
      val t0 = System.nanoTime()
      var x = 0L; var i = 0
      while (i < 200000000) { x += i * 2654435761L; i += 1 }
      if (x == 42) println("")
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, f: () => Unit, n: Int = 3): Double = {
      f() // warm
      val ts = (0 until n).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-34s min=${ts.min}%.3f med=${ts.sorted.apply(n / 2)}%.3f")
      ts.min
    }

    val res = Seq("/tmp/graft_scale_10x", "/tmp/graft_scale_100x").map { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val c0 = calib()
      val n = 10
      // stage A: whole-corpus gram hash + explode + shuffle-agg (dupGrams)
      val occs = docs.select(col("doc_id"),
          posexplode(graft.ext.functions.positionalGramHashes(col("text"), n))
            .as(Seq("pos", "g")))
        .withColumn("occ", struct(col("doc_id").as("d"), col("pos").as("p")))
      val tA = time(s"A gram+agg        $dir", () => noop(
        occs.groupBy("g").agg(count(lit(1)).as("cnt"), min("occ").as("canon"))
          .filter(col("cnt") > 1)))
      // stage B: the dup join (second full occs shuffle) + covered explode
      val dupGrams = occs.groupBy("g")
        .agg(count(lit(1)).as("cnt"), min("occ").as("canon"))
        .filter(col("cnt") > 1)
      val removals = occs.join(dupGrams, "g").filter(col("occ") =!= col("canon"))
      val tB = time(s"B dupjoin+covered $dir", () => noop(
        removals.select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
          .distinct()))
      // stage C: full operator
      val tC = time(s"C full q71        $dir", () => noop(
        graft.ext.TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text", n)))
      val c1 = calib()
      println(f"[probe] calib $dir start=$c0%.3f end=$c1%.3f")
      (tA, tB, tC, (c0 + c1) / 2)
    }
    val Seq((a1, b1, cc1, k1), (a2, b2, cc2, k2)) = res
    def exp(lo: Double, hi: Double) = math.log(hi / lo) / math.log(10.0)
    println(f"[probe] exponents 10x->100x: A=${exp(a1, a2)}%.2f B=${exp(b1, b2)}%.2f full=${exp(cc1, cc2)}%.2f calibRatio=${k2 / k1}%.2f")
    spark.stop()
  }
}
