package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{functions => gf}

/** The injected SQL faces of the native ext expressions must agree with
 *  the Column API bit-for-bit (same Catalyst nodes underneath). */
class FunctionsSqlSpec extends SparkSpec {
  import spark.implicits._

  test("scalar ext functions resolve in SQL and match the Column API") {
    val docs = Seq((1L, "the quick brown fox jumps"), (2L, "jumps fox brown quick the"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("fn_docs")

    val sql = spark.sql(
      """SELECT id, fingerprint64(text) AS fp,
        |       simhash64(split(text, ' ')) AS sh,
        |       hashed_shingles(text, 2) AS hs
        |FROM fn_docs""".stripMargin)
      .select("id", "fp", "sh", "hs")
    val api = docs.select(col("id"), gf.fingerprint64(col("text")).as("fp"),
      gf.simhash64(split(col("text"), " ")).as("sh"),
      gf.hashedShingles(col("text"), 2).as("hs"))
    assert(sql.collect().toSeq === api.collect().toSeq)

    val cos = spark.sql(
      """SELECT cosine_similarity(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
        |                         CAST(array(0.0, 1.0) AS ARRAY<DOUBLE>)) AS c""".stripMargin)
      .as[Double].head()
    assert(cos === 0.0)
  }

  test("int8_codes / int8_cosine resolve in SQL and match the Column API") {
    val vecs = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.75f)),
      (2L, Array(0.5f, -1.0f, 0.25f, 0.75f)),
      (3L, Array(-0.2f, 0.9f, 0.1f, -0.6f))).toDF("id", "vec")
    vecs.createOrReplaceTempView("fn_int8")
    val sql = spark.sql(
      """SELECT a.id AS ia, b.id AS ib,
        |       int8_cosine(int8_codes(a.vec), int8_codes(b.vec)) AS qc
        |FROM fn_int8 a JOIN fn_int8 b ON a.id < b.id
        |ORDER BY ia, ib""".stripMargin)
    val api = vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        gf.int8Cosine(gf.int8Codes(col("a.vec")), gf.int8Codes(col("b.vec"))).as("qc"))
      .orderBy("ia", "ib")
    assert(sql.collect().toSeq === api.collect().toSeq)
    // identical vectors quantize identically → ≈1.0 through SQL (one ulp
    // from the sqrt(na)*sqrt(nb) rounding)
    assert(math.abs(sql.filter("ia = 1 and ib = 2").select("qc")
      .as[Double].head() - 1.0) < 1e-12)
  }

  test("minhash_signature, token_count, avg_token_length match the Column API") {
    val docs = Seq((1L, "the quick brown fox jumps over"), (2L, "pack my box"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("fn_docs3")
    import graft.ext.TextAnalysis
    val sql = spark.sql(
      """SELECT id, minhash_signature(split(text, ' ')) AS mh,
        |       minhash_signature(split(text, ' '), 16, 7) AS mh16,
        |       token_count(text) AS tc, avg_token_length(text) AS atl
        |FROM fn_docs3 ORDER BY id""".stripMargin)
    val tokens = split(col("text"), " ")
    val api = docs.select(col("id"),
      gf.minhashSignature(tokens).as("mh"),
      gf.minhashSignature(tokens, numHashes = 16, seed = 7L).as("mh16"),
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.avgTokenLength(col("text")).as("atl")).orderBy("id")
    assert(sql.collect().toSeq === api.collect().toSeq)
  }

  test("approx_top_items works as a SQL aggregate in the exact regime") {
    // 60 a, 30 b, 10 c — capacity 16 > 3 distinct items → exact counts
    spark.range(0, 100).selectExpr(
      "CASE WHEN id < 60 THEN 'a' WHEN id < 90 THEN 'b' ELSE 'c' END AS w")
      .createOrReplaceTempView("fn_words")
    val got = spark.sql(
      "SELECT approx_top_items(w, 16, 2) AS top FROM fn_words")
      .selectExpr("inline(top)").as[(String, Long, Long)].collect().toSeq
    // err = 0: capacity never overflowed, counts are exact
    assert(got === Seq(("a", 60L, 0L), ("b", 30L, 0L)))
  }

  test("kmv_distinct works as a SQL aggregate, grouped and exact under k") {
    spark.range(0, 3000).selectExpr("id % 3 AS g", "id % 300 AS v")
      .createOrReplaceTempView("fn_vals")
    // v = id % 300 within g = id % 3: ids of one group step by 3, so each
    // group sees 100 distinct values
    val got = spark.sql(
      "SELECT g, kmv_distinct(v, 1024) AS nd FROM fn_vals GROUP BY g ORDER BY g")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 100L), (1L, 100L), (2L, 100L)))
  }

  test("sketch state/merge functions resolve in SQL and round-trip through a view") {
    spark.range(0, 3000).selectExpr("id % 3 AS g", "id % 300 AS v")
      .createOrReplaceTempView("fn_state_vals")
    // store per (g, parity) states, then merge back per g — exact regime
    spark.sql(
      """SELECT g, kmv_state(v, 1024) AS st, top_items_state(CAST(v % 7 AS STRING), 1024) AS ts
        |FROM fn_state_vals GROUP BY g, v % 2""".stripMargin)
      .createOrReplaceTempView("fn_states")
    val got = spark.sql(
      "SELECT g, kmv_merge(st, 1024) AS nd FROM fn_states GROUP BY g ORDER BY g")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 100L), (1L, 100L), (2L, 100L)))
    // rollup: merge_state across groups, then serve globally
    val global = spark.sql(
      """SELECT kmv_merge(st2, 1024) FROM
        |  (SELECT kmv_merge_state(st, 1024) AS st2 FROM fn_states GROUP BY g)""".stripMargin)
      .as[Long].head()
    assert(global === 300L)
    val top = spark.sql(
      "SELECT top_items_merge(ts, 1024, 2) FROM fn_states")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(top.length === 2 && top.forall(_.getLong(2) === 0L))
  }

  test("size/seed arguments must be literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(id, CAST(id AS INT)) FROM range(5)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("arity is an exact range; extra or out-of-Int-range args fail loudly") {
    // extra trailing argument: error, not silent ignore
    val extra = intercept[Exception] {
      spark.sql("SELECT fingerprint64('a', 99)").collect()
    }
    assert(extra.getMessage.contains("argument"))
    val extraCos = intercept[Exception] {
      spark.sql("""SELECT cosine_similarity(CAST(array(1.0) AS ARRAY<DOUBLE>),
                  |CAST(array(1.0) AS ARRAY<DOUBLE>), 3)""".stripMargin).collect()
    }
    assert(extraCos.getMessage.contains("argument"))
    // a Long literal past Int.MaxValue must not silently truncate into a
    // wrong (even negative) sketch capacity
    val big = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(id, 5000000000) FROM range(5)").collect()
    }
    assert(big.getMessage.contains("out of Int range"))
  }

  test("text-quality kernels and composites resolve in SQL, match Column API") {
    val docs = Seq((1L, "the quick brown fox! and the lazy dog."),
      (2L, "a b a b a b a b a b")).toDF("id", "text")
    docs.createOrReplaceTempView("fn_docs2")
    import graft.ext.TextAnalysis
    val sql = spark.sql(
      """SELECT id, punct_count(text) AS pc, space_token_count(text) AS tc,
        |       stopword_hits(text, 'the', 'and', 'of', 'to', 'is') AS sh,
        |       punct_ratio(text) AS pr, stopword_ratio(text) AS sr,
        |       quality_score(text) AS qs, lang_id(text) AS lang,
        |       repetition_ratio(text) AS rep,
        |       bpe_token_count(text) AS bpe
        |FROM fn_docs2 ORDER BY id""".stripMargin)
    val api = docs.select(col("id"),
      gf.punctCount(col("text")).as("pc"),
      gf.spaceTokenCount(col("text")).as("tc"),
      gf.stopwordHits(col("text"), Seq("the", "and", "of", "to", "is")).as("sh"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.qualityScore(col("text")).as("qs"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.repetitionRatio(col("text")).as("rep"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe")).orderBy("id")
    assert(sql.collect().toSeq === api.collect().toSeq)

    val more = spark.sql(
      """SELECT normalize_text(scrub_pii(' Mail a@b.co  NOW ')) AS clean,
        |  chunk_tokens('a b c d e f', 4, 3) AS ch,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
        |  hyperplane_bucket(CAST(array(1.0, -1.0) AS ARRAY<FLOAT>)) AS hb""".stripMargin)
      .collect().head
    assert(more.getString(0) === "mail <email> now")
    assert(more.getSeq[String](1) === Seq("a b c d", "d e f"))
    assert(more.getInt(2) === 2)
    // same bucket as the Column API default parameters
    val hbApi = Seq(Tuple1(Array(1.0f, -1.0f))).toDF("v")
      .select(gf.hyperplaneBucket(col("v")).as("b")).as[Long].head()
    assert(more.getLong(3) === hbApi)
  }

  test("positional_gram_hashes resolves in SQL and matches the Column API") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text")
    docs.createOrReplaceTempView("fn_docs_pg")
    val sql = spark.sql("SELECT positional_gram_hashes(text, 3) AS h FROM fn_docs_pg")
      .as[Seq[Long]].head()
    val api = docs.select(gf.positionalGramHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].head()
    assert(sql === api && sql.size === 3)
  }

  test("random_projection resolves in SQL and matches the Column API") {
    val vecs = Seq((1L, Array(0.5f, -1.0f, 2.0f, 0.25f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("id", "v")
    vecs.createOrReplaceTempView("fn_vecs")
    val sql = spark.sql(
      "SELECT id, random_projection(v, 2) AS p FROM fn_vecs ORDER BY id")
      .as[(Long, Seq[Double])].collect().toSeq
    val api = vecs.select(col("id"),
        graft.ext.Similarity.randomProjection(col("v"), 2).as("p"))
      .orderBy("id").as[(Long, Seq[Double])].collect().toSeq
    assert(sql === api)
    // outDim must be a literal; arity is exact
    intercept[Exception](
      spark.sql("SELECT random_projection(v, id) FROM fn_vecs").collect())
    intercept[Exception](
      spark.sql("SELECT random_projection(v, 2, 1, 9) FROM fn_vecs").collect())
  }

  test("sampling TVFs resolve in SQL and match the Column API") {
    import graft.ext.Sampling
    val docs = (1L to 40L).map(i =>
      (i, s"d${i % 4}", (i % 7).toDouble, (i % 5) + 1L)).toDF("id", "dom", "score", "w")
    docs.createOrReplaceTempView("tvf_docs")

    // capPerGroup: top-2 per domain by (-score, id)
    val capSql = spark.sql(
      "SELECT id FROM graft_cap_per_group('tvf_docs', 'dom', '-score,id', 2) ORDER BY id")
      .as[Long].collect().toSeq
    val capApi = Sampling.capPerGroup(docs, "dom", Seq(col("score").desc, col("id").asc), 2)
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(capSql === capApi && capSql.nonEmpty)

    // budgetPerGroup: weight-budgeted selection per domain
    val budSql = spark.sql(
      "SELECT id FROM graft_budget_per_group('tvf_docs', 'dom', 'score', 'w', 'id', 9) ORDER BY id")
      .as[Long].collect().toSeq
    val budApi = Sampling.budgetPerGroup(docs, "dom", "score", "w", "id", budget = 9)
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(budSql === budApi && budSql.nonEmpty)

    // gumbelTopK: deterministic salted resample
    val gumSql = spark.sql(
      "SELECT id FROM graft_gumbel_topk('tvf_docs', 'id', 'score', 5) ORDER BY id")
      .as[Long].collect().toSeq
    val gumApi = Sampling.gumbelTopK(docs, "id", "score", k = 5)
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(gumSql === gumApi && gumSql.size === 5)

    // epochShuffle: replayable epoch-keyed total order with positions
    val shSql = spark.sql(
      "SELECT id, pos FROM graft_epoch_shuffle('tvf_docs', 'id', 3) ORDER BY pos")
      .as[(Long, Long)].collect().toSeq
    val shApi = Sampling.epochShuffle(docs, "id", epoch = 3)
      .select(col("id"), col("pos")).orderBy("pos").as[(Long, Long)].collect().toSeq
    assert(shSql === shApi && shSql.size === 40)
    // different epoch → different permutation (same set)
    val sh4 = spark.sql(
      "SELECT id, pos FROM graft_epoch_shuffle('tvf_docs', 'id', 4) ORDER BY pos")
      .as[(Long, Long)].collect().toSeq
    assert(sh4.map(_._1) !== shSql.map(_._1))
    assert(sh4.map(_._1).toSet === shSql.map(_._1).toSet)

    // guards: literal-only arguments, arity ranges, resolvable view name
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_gumbel_topk('tvf_docs', 'id', 'score')").collect())
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_cap_per_group('tvf_docs', 'dom', '', 2)").collect())
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_epoch_shuffle('no_such_view', 'id', 1)").collect())
  }
}
