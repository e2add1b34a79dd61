package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR.
 *
 * Output contract (the driver keeps only the LAST ~2000 chars of stdout, so
 * ordering matters — round 6's recorded bench lost q01–q19 and the suite
 * total to the tail capture):
 *
 *   1. a full detail JSON line (every query's median + min, per-rep times for
 *      the mutation queries) — printed first AND written to
 *      `BENCH_DETAIL.json` in the working directory so it survives intact;
 *   2. a compact headline JSON line printed LAST (< ~1800 chars): suite
 *      total, point-lookup class, mutation class with per-rep times,
 *      worst-3 regressions vs the previous recorded round, and the
 *      scaling exponents. This line alone is a parseable summary.
 *
 * Each query is materialized with a noop-format write — the full declared
 * plan executes (projections, expressions, joins) without the Catalyst
 * pruning a bare `count()` would trigger, and without writing bytes.
 */
object Bench {
  /** Queries that do real table mutations (parquet writes / commits) per
    * rep — a disturbed rep (box contention during a write) shows up as one
    * outlier in the per-rep list rather than poisoning a single number. */
  private val mutationClass = Set(
    "q18_scd2_merge", "q41_hudi_upsert", "q55_change_feed", "q64_mor_delete",
    "q70_replace_where", "q77_branch_wap", "q78_stream_roundtrip",
    "q81_stream_window", "q85_dv_delete", "q86_dv_update",
    "q115_apply_changes")

  /** Point-lookup class graded against BASELINE.md's Athena lookups. */
  private val lookupClass = Seq(
    "q02_point_lookup", "q19_snapshot_point_lookup", "q43_zorder_scan",
    "q69_bloom_lookup")

  /** Best-effort per-query minimums from a prior round's recorded bench.
    * The prior artifact may be a truncated tail wrapper, so parse leniently:
    * scan for `"qNN_name":N.NNN` pairs and keep the minimum seen per key
    * (keys appear in both the median and min maps; min-of-seen ≈ min map). */
  private def prevMins(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val text =
        try scala.io.Source.fromFile(f, "UTF-8").mkString
        catch { case scala.util.control.NonFatal(_) => return Map.empty }
      // Quotes may be backslash-escaped: the driver's BENCH_r*.json wraps the
      // bench line inside a JSON "tail" string field.
      val pair = """\\?"(q\d{2,3}_[a-z0-9_]+)\\?"\s*:\s*(-?\d+\.\d+)""".r
      pair.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .toSeq.filter(_._2 >= 0)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
  }

  private def defaultPrevBench(): Option[String] = {
    val rx = """BENCH_r(\d+)\.json""".r
    Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case rx(n) => Some(n.toInt -> f.getPath)
        case _     => None
      })
      .sortBy(-_._1).headOption.map(_._2)
  }

  private def jnum(d: Double): String = f"$d%.3f"

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
    val results: Seq[(String, Seq[Double])] = ordered.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      name -> times
    }
    def med(ts: Seq[Double]): Double =
      if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2)
    def mn(ts: Seq[Double]): Double = if (ts.isEmpty) -1.0 else ts.min
    val medians = results.map { case (k, ts) => k -> med(ts) }
    val minima  = results.map { case (k, ts) => k -> mn(ts) }.toMap
    val qs   = medians.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    val mins = results.map { case (k, ts) => "\"" + k + "\":" + jnum(mn(ts)) }.mkString("{", ",", "}")
    val perRep = results.collect { case (k, ts) if mutationClass(k) =>
      "\"" + k + "\":[" + ts.map(jnum).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val totalMin = minima.values.filter(_ >= 0).sum
    // Scaling-curve evidence for the pair-mining queries (SURVEY §6):
    // re-time them at the next SF down and report the observed wall-clock
    // exponent log10(t_hi / t_lo) over the 10x data step. Exponents near
    // 1 = linear; anything approaching 2 flags a quadratic pair
    // generator. (Wall-clock exponents BELOW the work exponent are
    // expected at these sizes — fixed job overhead dominates the small
    // SF.)
    // q48 and q102 both run the auto-sized geometry now (auto became
    // embeddingPairs' default in round 9; the fixed-plane form survives
    // only as the explicit embeddingPairsFixed test override) — their
    // exponents should track each other and stay well under the old
    // fixed-plane 1.15.
    val scalingTrio = Seq("q21_jaccard_neardup", "q48_embedding_pairs",
      "q102_embedding_pairs_auto", "q62_dup_ngram_frac", "q71_span_removal",
      "q90_bigram_logprob")
    val loDir = sys.env.getOrElse("SPARK_GRAFT_SCALING_LO", sfDir.replace("sf0.1", "sf0.01"))
    // Larger upper point: a synthesized ~10x corpus
    // ([[graft.tools.ScaleCorpus]]) moves the scaling step to
    // sf0.1 -> 10x, where fixed job overhead no longer dominates and the
    // exponent reflects the actual work curve. Recorded rounds run at
    // sf0.1, so generate the corpus by default (idempotent, a few
    // seconds); SPARK_GRAFT_SCALING_HI overrides the location.
    val hiDir = sys.env.get("SPARK_GRAFT_SCALING_HI")
      .orElse {
        if (sfDir.contains("sf0.1") &&
            graft.tools.ScaleCorpus.ensure(spark)) Some(graft.tools.ScaleCorpus.DefaultDir)
        else None
      }
      .filter(d => new java.io.File(d).isDirectory)
    val scaling = {
      val (fromDir, toDir) = hiDir match {
        case Some(hi) => (sfDir, hi)
        case None     => (loDir, sfDir)
      }
      if (fromDir == toDir || !new java.io.File(fromDir).isDirectory) ""
      else {
        // The exponent divides two sub-second wall-clock minima, so it
        // amplifies machine noise quadratically in rep scarcity —
        // consecutive identical-code runs measured q48 exponents from
        // 0.5 to 0.75 at 3 reps. The scaling block therefore takes the
        // min over at least 5 reps (still seconds of extra bench time).
        val scalingReps = math.max(reps, 5)
        val parts = scalingTrio.flatMap { name =>
          SparkEntry.queries.get(name).flatMap { fn =>
            try {
              def timeAt(dir: String): Double = {
                fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
                (1 to scalingReps).map { _ =>
                  val t0 = System.nanoTime()
                  fn(spark, dir).write.format("noop").mode("overwrite").save()
                  (System.nanoTime() - t0) / 1e9
                }.min
              }
              val lo = if (fromDir == sfDir) minima.getOrElse(name, -1.0) else timeAt(fromDir)
              val hi = timeAt(toDir)
              if (lo <= 0 || hi <= 0) None
              else {
                val exp = math.log10(hi / lo)
                Some("\"" + name + s"""\":{"lo":${jnum(lo)},"hi":${jnum(hi)},"exp":${f"$exp%.2f"}}""")
              }
            } catch { case e: Throwable =>
              System.err.println(s"[bench][scaling] $name: ${e.getMessage}"); None
            }
          }
        }
        // ANN SERVING latency — the build-once/probe-forever steady state
        // (q67/q84/q87's 100 TB shape): the index builds UNTIMED on each
        // corpus with nlist ∝ √N (the FAISS sizing rule, so per-list load
        // grows as √N, not N), then ONLY the probe is timed. The exponent
        // says how serving latency moves with a 10× corpus — the declared
        // queries can't show this because they time build + probe.
        import org.apache.spark.sql.functions.col
        def annScaling(name: String)(
            mk: String => (() => Unit, () => Unit)): Option[String] =
          try {
            def timeAt(dir: String): Double = {
              val (probe, cleanup) = mk(dir)
              try {
                probe() // warm
                (1 to scalingReps).map { _ =>
                  val t0 = System.nanoTime(); probe(); (System.nanoTime() - t0) / 1e9
                }.min
              } finally cleanup()
            }
            val lo = timeAt(fromDir)
            val hi = timeAt(toDir)
            if (lo <= 0 || hi <= 0) None
            else Some("\"" + name +
              s"""\":{"lo":${jnum(lo)},"hi":${jnum(hi)},"exp":${f"${math.log10(hi / lo)}%.2f"}}""")
          } catch { case e: Throwable =>
            System.err.println(s"[bench][scaling] $name: ${e.getMessage}"); None
          }
        def embAt(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
        def nlistFor(df: org.apache.spark.sql.DataFrame): Int =
          math.max(16, math.sqrt(df.count().toDouble).toInt)
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val annParts = Seq(
          annScaling("ivf_probe") { dir =>
            val emb = embAt(dir)
            val idx = ext.Similarity.ivfBuild(emb, "vec_id", "embedding",
              nlist = nlistFor(emb))
            idx.assigned.persist(); idx.assigned.count() // index is built state
            val probes = emb.filter(col("vec_id") < 100)
            (() => noop(ext.Similarity.ivfProbe(idx, probes, "vec_id", "embedding",
              k = 5, nProbe = 4)),
             () => { idx.assigned.unpersist(); () })
          },
          annScaling("ivf_probe_pq_refined") { dir =>
            val emb = embAt(dir)
            val idx = ext.Similarity.ivfBuildPq(emb, "vec_id", "embedding",
              nlist = nlistFor(emb), m = 8, ksub = 16)
            idx.assigned.persist(); idx.assigned.count()
            val probes = emb.filter(col("vec_id") < 100)
            (() => noop(ext.Similarity.ivfProbePqRefined(idx, emb, probes,
              "vec_id", "embedding", k = 5, nProbe = 4, refine = 50)),
             () => { idx.assigned.unpersist(); () })
          },
          // tokenizer TRAINING cost curve (q100's operator on the real
          // corpus): per-round work rides the word-TYPE table, which
          // grows sub-linearly in corpus size — the Sennrich collapse
          // is what the exponent evidences
          annScaling("bpe_train16") { dir =>
            val docs = spark.read.parquet(s"$dir/documents.parquet")
            (() => { ext.BpeTrain.train(docs, "text", numMerges = 16); () },
             () => ())
          },
          // LSH-bucketed semantic decontamination (q98's large-benchmark
          // regime, forced via cutover 0; benchmark grows WITH the
          // corpus): auto sizing holds per-bucket bench load near its
          // target, so the exponent evidences the |corpus|·bucketRows
          // cost shape — not |corpus|·|bench|, which would be quadratic
          // here since both sides scale together
          annScaling("semantic_decontam_bucketed") { dir =>
            val emb = embAt(dir)
            val bench = emb.filter(col("vec_id") % 10 === 0)
              .select(col("embedding").as("bvec"))
            (() => noop(ext.Decontaminate.semanticContaminatedIdsAuto(
              emb, "vec_id", "embedding", bench, "bvec", minCos = 0.95,
              broadcastMaxBenchRows = 0)),
             () => ())
          },
          // k-bounded quantile sketch in its ESTIMATOR regime (k = 256
          // far under the per-language row count at both points): the
          // map-side partial/final aggregation shape — cost tracks the
          // scan, state stays k-bounded
          annScaling("quantile_sketch_profile") { dir =>
            val docs = spark.read.parquet(s"$dir/documents.parquet")
            (() => noop(docs.groupBy("lang").agg(ext.functions.quantileSketchMulti(
              col("n_chars").cast("double"), Seq(0.25, 0.5, 0.75, 0.99), 256))),
             () => ())
          }).flatten
        val all = parts ++ annParts
        if (all.isEmpty) ""
        else all.mkString(
          s""","scaling_lo_sf":"$fromDir","scaling_hi_sf":"$toDir","scaling_10x":{""", ",", "}")
      }
    }
    // Testdata fingerprint: per-table row counts + an order-independent
    // content hash (bit_xor of per-row xxhash64). The driver may
    // REGENERATE /root/testdata between rounds (round 6's events.ts type
    // flip; r7's q38-q40 drift) — recording the fingerprint makes fixture
    // drift distinguishable from performance regression by construction.
    val fpTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fps: Seq[(String, Long, Long)] = fpTables.flatMap { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        val hashExpr = s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(",")}))"
        val row = df.selectExpr("count(1)", hashExpr).head()
        Some((t, row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench][fp] $t: ${e.getMessage}"); None
      }
    }
    val fpHex = f"${fps.foldLeft(0L) { case (acc, (_, n, h)) =>
      acc ^ h ^ java.lang.Long.rotateLeft(n * 0x9E3779B97F4A7C15L, 17) }}%016x"
    val fpDetail = fps.map { case (t, n, h) =>
      "\"" + t + s"""\":{"rows":$n,"hash":"${f"$h%016x"}"}"""
    }.mkString("{", ",", "}")

    // Worst-3 regressions vs the previous recorded round (min vs min) —
    // suppressed entirely when the previous round recorded a DIFFERENT
    // testdata fingerprint (the numbers are not comparable; r7 burned a
    // worst-3 slot on exactly that).
    val prevPath = sys.env.get("SPARK_GRAFT_PREV_BENCH").orElse(defaultPrevBench())
    val prevFp: Option[String] = prevPath.flatMap { p =>
      val f = new java.io.File(p)
      if (!f.isFile) None
      else scala.util.Try(scala.io.Source.fromFile(f, "UTF-8").mkString).toOption
        .flatMap("""testdata_fp\\?":\s*\\?"([0-9a-f]{16})""".r
          .findFirstMatchIn(_).map(_.group(1)))
    }
    val fixtureDrift = prevFp.exists(_ != fpHex)
    val prev = prevPath.map(prevMins).getOrElse(Map.empty)
    val deltas = minima.toSeq.flatMap { case (k, now) =>
      prev.get(k).filter(p => p > 0 && now > 0).map(p => (k, p, now, now / p))
    }.sortBy(-_._4).take(3)
    val worst = if (fixtureDrift) "[]"
      else deltas.map { case (k, p, now, r) =>
        "{\"q\":\"" + k + s"""\",\"prev\":${jnum(p)},\"now\":${jnum(now)},\"ratio\":${f"$r%.2f"}}"""
      }.mkString("[", ",", "]")
    val worstNote = if (fixtureDrift)
      s""","worst3_note":"suppressed: testdata fingerprint changed (prev ${prevFp.get})"""" else ""
    val lookups = lookupClass.flatMap(k => minima.get(k).map(v => "\"" + k + "\":" + jnum(v)))
      .mkString("{", ",", "}")

    val detailLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"queries":$qs,"queries_min":$mins,"mutation_reps":$perRep,"testdata_fp":"$fpHex","testdata_fingerprint":$fpDetail,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter(new java.io.File("BENCH_DETAIL.json"), "UTF-8")
      try w.println(detailLine) finally w.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] BENCH_DETAIL.json write failed: ${e.getMessage}")
    }
    println(detailLine)
    // Headline block LAST: this is the line the tail capture must preserve.
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_min":$totalMin%.3f,"reps":$reps,"n_queries":${results.size},"lookup_min":$lookups,"mutation_reps":$perRep,"worst3_vs_prev":$worst$worstNote,"testdata_fp":"$fpHex","prev_bench":"${prevPath.getOrElse("none")}"$scaling,"detail_file":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
