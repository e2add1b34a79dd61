package graft.scd2

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Golden-contract tests from the reference's own fixtures and screenshots
 * (SURVEY.md §5.1, FIXTURES.md §1.3). Note: the shipped CSVs contain 1,000
 * initial rows (ids 1-1000, CRLF line endings, final line unterminated) and
 * 1,100 staged rows with 92 changed + 100 new ids (1001-1100) — the
 * README's printed counts (999/101) disagree with the repo's own data; we
 * assert against the data. After merge every changed id has exactly 2 rows
 * (expired with valid_to chained + current), unchanged/new ids 1 row, and
 * per id exactly one iscurrent=1.
 */
class Scd2Spec extends SparkSpec {

  private val initialCsv = "/root/reference/data/initial_contacts.csv"
  private val updateCsv = "/root/reference/data/update_contacts.csv"
  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-02-01 00:00:00")

  private def assertScd2Contract(finalDf: DataFrame, expectTsRefresh: Boolean): Unit = {
    val f = finalDf.cache()
    try {
      assert(f.count() === 1192, "total logical versions = 1100 + 92")
      // per id exactly one current row
      val badCurrent = f.filter(col("iscurrent") === 1)
        .groupBy("id").count().filter(col("count") =!= 1).count()
      assert(badCurrent === 0, "every id has exactly one iscurrent=1")
      // 92 changed ids have 2 rows; everyone else 1
      val twoRow = f.groupBy("id").count().filter(col("count") === 2).count()
      assert(twoRow === 92, "exactly the 92 changed ids have two versions")
      assert(f.groupBy("id").count().filter(col("count") > 2).count() === 0)
      // expired rows chain: valid_to = successor's valid_from, checksums differ
      val expired = f.filter(col("iscurrent") === 0)
      assert(expired.count() === 92)
      assert(expired.filter(col("valid_to").isNull).count() === 0)
      val pairs = f.filter(col("iscurrent") === 0).alias("old")
        .join(f.filter(col("iscurrent") === 1).alias("new"),
          col("old.id") === col("new.id"))
      assert(pairs.filter(col("old.valid_to") =!= col("new.valid_from")).count() === 0,
        "interval chains without gaps")
      assert(pairs.filter(col("old.checksum") === col("new.checksum")).count() === 0)
      // current rows have open intervals
      assert(f.filter(col("iscurrent") === 1 && col("valid_to").isNotNull).count() === 0)
      // new ids 1001-1100 present and current
      assert(f.filter(col("id") >= 1001 && col("iscurrent") === 1).count() === 100)
    } finally f.unpersist()
  }

  test("typed contact read matches the untyped scan row-for-row") {
    val typed = Scd2.readContactsCsvTyped(spark, initialCsv)
    assert(typed.count() === 1000)
    // typed field access compiles and agrees with the DataFrame view
    val maxIdTyped = typed.collect().flatMap(_.id).max
    val maxIdDf = Scd2.readContactsCsv(spark, initialCsv)
      .agg(max(col("id"))).collect()(0).getInt(0)
    assert(maxIdTyped === maxIdDf)
  }

  test("hudi-style merge reproduces the golden contract + stage counts") {
    val initial = Scd2.readContactsCsv(spark, initialCsv)
    val table = Scd2.initialLoad(spark, tmpDir("scd2h"), initial, t0)
    assert(table.read().count() === 1000)

    val counts = Scd2.hudiStyleMerge(table, Scd2.readContactsCsv(spark, updateCsv), t1)
    assert(counts === Scd2.MergeCounts(1000, 1100, 92, 1192))
    assertScd2Contract(table.read(), expectTsRefresh = true)

    // the reference's Athena golden query: a changed id has exactly 2 rows
    val changedId = table.read().filter(col("iscurrent") === 0)
      .select("id").limit(1).collect()(0).getInt(0)
    assert(table.read().filter(col("id") === changedId).count() === 2)
  }

  test("iceberg-style merge reproduces the golden contract and refreshes unchanged rows") {
    val initial = Scd2.readContactsCsv(spark, initialCsv)
    val table = Scd2.initialLoad(spark, tmpDir("scd2i"), initial, t0)
    Scd2.icebergStyleMerge(table, Scd2.readContactsCsv(spark, updateCsv), t1)
    assertScd2Contract(table.read(), expectTsRefresh = true)
    // §3.3 quirk: unchanged staged rows matched on (id, checksum) get
    // UPDATE SET * → their valid_from is refreshed to the new load ts.
    val unchangedCurrent = table.read()
      .filter(col("iscurrent") === 1 && col("id") < 1000)
    assert(unchangedCurrent.filter(col("valid_from") === lit(t0)).count() === 0,
      "UPDATE SET * refreshes unchanged matched rows (do not optimize away)")
  }

  test("delta-style merge reproduces the golden contract without ts column") {
    val initial = Scd2.readContactsCsv(spark, initialCsv)
    val table = Scd2.initialLoad(spark, tmpDir("scd2d"), initial, t0, withTs = false)
    assert(!table.schema.fieldNames.contains("ts"),
      "Delta variant carries no precombine column")
    Scd2.deltaStyleMerge(table, Scd2.readContactsCsv(spark, updateCsv), t1)
    assertScd2Contract(table.read(), expectTsRefresh = false)
  }

  test("re-merging the same batch is a no-op for row counts (idempotence)") {
    val initial = Scd2.readContactsCsv(spark, initialCsv)
    val table = Scd2.initialLoad(spark, tmpDir("scd2r"), initial, t0)
    val upd = Scd2.readContactsCsv(spark, updateCsv)
    Scd2.hudiStyleMerge(table, upd, t1)
    val c1 = table.read().count()
    Scd2.hudiStyleMerge(table, upd, Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(table.read().count() === c1, "no new versions when payloads unchanged")
  }

  test("NULL payload → NULL checksum → row never selected for expiry") {
    import spark.implicits._
    val init = Seq((1, "n", null.asInstanceOf[String], "CA"))
      .toDF("id", "name", "email", "state")
    val table = Scd2.initialLoad(spark, tmpDir("scd2n"), init, t0)
    val upd = Seq((1, "n", null.asInstanceOf[String], "NY"))
      .toDF("id", "name", "email", "state")
    val counts = Scd2.hudiStyleMerge(table, upd, t1)
    // NULL != NULL is NULL → join never selects the row for expiry
    assert(counts.toExpire === 0)
  }
}
