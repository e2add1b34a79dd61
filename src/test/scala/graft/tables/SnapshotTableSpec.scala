package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  test("create / read round-trip") {
    val t = SnapshotTable.create(spark, tmpDir("tbl"),
      Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
    assert(t.currentVersion() === 0)
    assert(t.schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("overwrite is atomic and versioned; time travel reads old snapshots") {
    val t = SnapshotTable.create(spark, tmpDir("tbl"),
      Seq((1, "a")).toDF("id", "v"))
    t.overwrite(Seq((2, "b"), (3, "c")).toDF("id", "v"))
    assert(t.currentVersion() === 1)
    assert(t.read().as[(Int, String)].collect().toSet === Set((2, "b"), (3, "c")))
    assert(t.readVersion(0).as[(Int, String)].collect().toSet === Set((1, "a")))
  }

  test("append carries prior files forward without rewrite") {
    val t = SnapshotTable.create(spark, tmpDir("tbl"),
      Seq((1, "a")).toDF("id", "v"))
    val filesBefore = t.manifest()
    t.append(Seq((2, "b")).toDF("id", "v"))
    assert(t.read().count() === 2)
    // prior files are reused verbatim — O(1) append
    assert(filesBefore.forall(t.manifest().contains))
    assert(t.manifest().size > filesBefore.size)
  }

  test("registered view refreshes on commit (catalog sync)") {
    val t = SnapshotTable.create(spark, tmpDir("tbl"),
      Seq((1, "a")).toDF("id", "v"))
    t.registerView("sync_test")
    assert(spark.table("sync_test").count() === 1)
    t.append(Seq((2, "b")).toDF("id", "v"))
    assert(spark.table("sync_test").count() === 2)
  }

  test("manifest is O(files) commit metadata, readable as parquet list") {
    val t = SnapshotTable.create(spark, tmpDir("tbl"),
      spark.range(100).withColumn("v", col("id") * 2))
    val m = t.manifest()
    assert(m.nonEmpty && m.forall(_.endsWith(".parquet")))
    assert(spark.read.parquet(m: _*).count() === 100)
  }
}
