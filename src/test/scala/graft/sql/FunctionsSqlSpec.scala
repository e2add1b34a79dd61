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

  test("size/seed arguments must be literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(id, CAST(id AS INT)) FROM range(5)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
