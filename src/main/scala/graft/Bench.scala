package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line. Each query is materialized with a noop-format
 * write — the full declared plan executes (projections, expressions,
 * joins) without Catalyst pruning work the way a bare `count()` would,
 * and without writing bytes anywhere.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local[32] is the contract for recorded rounds (32-core box); keep the
    // env override for laptops and for apples-to-apples reruns of old rounds.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Untimed warm pass: JIT + codegen caches + the one-time snapshot-table
    // build behind q19, so the timed pass measures steady-state latency
    // (the baseline's point lookups also hit pre-written tables).
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench][warm] $name: ${e.getMessage}") }
    }
    // Median of 3 timed runs per query: this box is shared, and a single
    // timing can be 3-5x off when the oracle runs concurrently (r4's recorded
    // bench was pure noise). The median rejects a one-off slow run; min is
    // reported alongside so the JSON carries noise information
    // (median >> min on a given query = that query's runs were disturbed).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = ordered.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      if (times.isEmpty) name -> (-1.0, -1.0)
      else {
        val sorted = times.sorted
        name -> (sorted(sorted.size / 2), sorted.head)
      }
    }
    val qs = results.map { case (k, (med, _)) => "\"" + k + f"""\":$med%.3f""" }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, (_, mn)) => "\"" + k + f"""\":$mn%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // Scaling-curve evidence for the pair-mining queries (SURVEY §6):
    // re-time them at the next SF down and report the observed wall-clock
    // exponent log10(t_hi / t_lo) over the 10x data step. Exponents near
    // 1 = linear; anything approaching 2 flags a quadratic pair
    // generator. (Wall-clock exponents BELOW the work exponent are
    // expected at these sizes — fixed job overhead dominates the small
    // SF.)
    val scalingTrio = Seq("q21_jaccard_neardup", "q48_embedding_pairs",
      "q62_dup_ngram_frac", "q71_span_removal")
    val loDir = sfDir.replace("sf0.1", "sf0.01")
    val scaling =
      if (loDir == sfDir || !new java.io.File(loDir).isDirectory) ""
      else {
        val parts = scalingTrio.flatMap { name =>
          SparkEntry.queries.get(name).flatMap { fn =>
            // no (positive) high-SF measurement → no exponent to compute;
            // skip before burning 1+reps low-SF executions on it
            val hi = results.collectFirst { case (`name`, (_, mn)) => mn }.filter(_ > 0)
            if (hi.isEmpty) None
            else try {
              fn(spark, loDir).write.format("noop").mode("overwrite").save() // warm
              val lo = (1 to reps).map { _ =>
                val t0 = System.nanoTime()
                fn(spark, loDir).write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              }.min
              hi.map { h =>
                val exp = math.log10(h / lo)
                "\"" + name + f"""\":{"lo":$lo%.3f,"hi":$h%.3f,"exp":$exp%.2f}"""
              }
            } catch { case e: Throwable =>
              System.err.println(s"[bench][scaling] $name: ${e.getMessage}"); None
            }
          }
        }
        if (parts.isEmpty) ""
        else parts.mkString(s""","scaling_lo_sf":"$loDir","scaling_10x":{""", ",", "}")
      }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"queries":$qs,"queries_min":$mins$scaling,"sf":"$sfDir"}""")
    spark.stop()
  }
}
