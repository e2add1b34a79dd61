package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SparkInternals.executedPlanString

import graft.SparkSpec

/** DSv2 catalog surface (S6): writeTo createOrReplace/append, CTAS,
 *  INSERT INTO, catalog reads with pushdown, SQL MERGE on catalog
 *  tables — `glue_catalog.default.iceberg_contact` semantics
 *  (`iceberg/iceberg_scd_script.py:34-37`). */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  /** True when the optimized plan collapsed to a LocalRelation (the
   *  metadata-only aggregate path — no scan). */
  private def hasLocalRelation(df: org.apache.spark.sql.DataFrame): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty

  test("writeTo createOrReplace + append + read back") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    df.writeTo("graft.db.t1").createOrReplace()
    assert(spark.table("graft.db.t1").as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
    Seq((3, "c")).toDF("id", "v").writeTo("graft.db.t1").append()
    assert(spark.table("graft.db.t1").count() === 3)
    // createOrReplace drops history and replaces content
    Seq((9, "z")).toDF("id", "v").writeTo("graft.db.t1").createOrReplace()
    assert(spark.table("graft.db.t1").as[(Int, String)].collect().toSet === Set((9, "z")))
  }

  test("ManifestFileIndex serves real mtimes harvested into the manifest") {
    Seq((1, "a"), (2, "b")).toDF("id", "v").writeTo("graft.db.tmt").createOrReplace()
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/tmt")
    // manifest-served scans build FileStatus from commit metadata, not a
    // filesystem listing — the harvested mtime must ride along, or
    // `_metadata.file_modification_time` silently reports epoch 1970
    val entries = t.manifestEntries()
    assert(entries.nonEmpty && entries.forall(_.mtime.exists(_ > 1577836800000L)),
      s"manifest mtimes: ${entries.map(_.mtime).mkString(",")}") // 2020-01-01
    val idx = new ManifestFileIndex(spark, entries)
    val statuses = idx.allFiles()
    assert(statuses.nonEmpty &&
      statuses.forall(_.getModificationTime > 1577836800000L),
      s"index mtimes: ${statuses.map(_.getModificationTime).mkString(",")}")
  }

  test("IsNotNull guards: consumed only when provably no-op, kept over nulls") {
    // nullable data: the guard must survive (rows with nulls filtered)
    spark.sql("DROP TABLE IF EXISTS graft.db.nng")
    Seq((1L, Option("a")), (2L, None), (3L, Option("c")))
      .toDF("id", "v").writeTo("graft.db.nng").createOrReplace()
    assert(spark.sql("SELECT id FROM graft.db.nng WHERE v IS NOT NULL")
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // no-null data: the planner's join-key IsNotNull guard is a provable
    // no-op and must not block the metadata aggregate serve — the
    // aggregate-then-join shape every reporting query takes
    spark.sql("DROP TABLE IF EXISTS graft.db.nns")
    spark.range(0, 400)
      .selectExpr("id", "CAST(id % 4 AS STRING) AS grp")
      .repartition(4, col("grp")).writeTo("graft.db.nns").createOrReplace()
    val dim = Seq(("0", "x"), ("1", "y"), ("2", "z"), ("3", "w")).toDF("grp", "label")
    dim.createOrReplaceTempView("nns_dim")
    val joined = spark.sql(
      """SELECT g.grp, d.label, g.n FROM
        |  (SELECT grp, count(*) AS n FROM graft.db.nns GROUP BY grp) g
        |JOIN nns_dim d ON g.grp = d.grp ORDER BY g.grp""".stripMargin)
    val plan = executedPlanString(joined)
    assert(plan.contains("GraftMetadataAgg"),
      s"join-key IsNotNull blocked the metadata aggregate:\n$plan")
    assert(joined.collect().map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("0", 100L), ("1", 100L), ("2", 100L), ("3", 100L)))
    // a consumed guard whose column is PRUNED from the projection (r15
    // regression pin): the guard must not reach the inner parquet scan —
    // parquet's record filter evaluates a column absent from the read
    // schema as NULL, and IsNotNull(absent) silently dropped every row
    assert(spark.sql("SELECT grp FROM graft.db.nns WHERE id IS NOT NULL")
      .collect().length === 400,
      "consumed no-op guard over a pruned column dropped rows")
    spark.sql("DROP TABLE graft.db.nng")
    spark.sql("DROP TABLE graft.db.nns")
  }

  test("CTAS, INSERT INTO, INSERT OVERWRITE via SQL") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t2")
    spark.sql("CREATE TABLE graft.db.t2 AS SELECT 1 AS id, 'x' AS v")
    spark.sql("INSERT INTO graft.db.t2 VALUES (2, 'y')")
    assert(spark.table("graft.db.t2").count() === 2)
    spark.sql("INSERT OVERWRITE graft.db.t2 VALUES (7, 'q')")
    assert(spark.table("graft.db.t2").as[(Int, String)].collect().toSet === Set((7, "q")))
  }

  test("CREATE TABLE with schema then insert; empty table readable") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t3")
    spark.sql("CREATE TABLE graft.db.t3 (id INT, v STRING) USING graft")
    assert(spark.table("graft.db.t3").count() === 0)
    spark.sql("INSERT INTO graft.db.t3 VALUES (1, 'a')")
    assert(spark.table("graft.db.t3").count() === 1)
  }

  test("filters push into the catalog scan (stats pruning behind SQL)") {
    spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2)
      .writeTo("graft.db.t4").createOrReplace()
    (1 to 3).foreach { i =>
      spark.range(i * 1000, (i + 1) * 1000).toDF("id").withColumn("v", col("id") * 2)
        .writeTo("graft.db.t4").append()
    }
    val q = spark.sql("SELECT id, v FROM graft.db.t4 WHERE id = 2500")
    assert(q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((2500L, 5000L)))
    // pushed filters visible in the v2 scan node
    val plan = executedPlanString(q)
    assert(plan.contains("PushedFilters") || plan.contains("RowDataSourceScan"),
      s"no pushdown evidence in:\n$plan")
  }

  test("SQL MERGE INTO a catalog table routes to the native merge") {
    Seq((1, "ck1", 1), (2, "ck2", 1)).toDF("id", "checksum", "iscurrent")
      .writeTo("graft.db.t5").createOrReplace()
    Seq((2, "ck2b", 1), (3, "ck3", 1)).toDF("id", "checksum", "iscurrent")
      .createOrReplaceTempView("cat_staged")
    spark.sql(
      """MERGE INTO graft.db.t5 tgt USING cat_staged src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("graft.db.t5").as[(Int, String, Int)].collect().toSet ===
      Set((1, "ck1", 1), (2, "ck2b", 1), (3, "ck3", 1)))
  }

  test("time travel: VERSION AS OF reads historic snapshots") {
    Seq((1, "v0")).toDF("id", "v").writeTo("graft.db.t7").createOrReplace()
    Seq((2, "v1")).toDF("id", "v").writeTo("graft.db.t7").append()
    assert(spark.table("graft.db.t7").count() === 2)
    // history: v0 = CREATE (empty), v1 = the replace write, v2 = append
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t7 VERSION AS OF 0")
      .as[Long].head() === 0)
    assert(spark.sql("SELECT * FROM graft.db.t7 VERSION AS OF 1")
      .as[(Int, String)].collect().toSeq === Seq((1, "v0")))
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t7 VERSION AS OF 2")
      .as[Long].head() === 2)
  }

  test("time travel: TIMESTAMP AS OF reads the snapshot at that instant") {
    Seq((1, "v0")).toDF("id", "v").writeTo("graft.db.t11").createOrReplace()
    Thread.sleep(20) // commit ts resolution is millis
    Seq((2, "v1")).toDF("id", "v").writeTo("graft.db.t11").append()
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/t11")
    // history: v0 CREATE (empty) + v1 replace-write + v2 append
    val writeTs = t.history().find(_.version == 1L).get.ts.get
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val asOf = fmt.format(writeTs)
    assert(spark.sql(s"SELECT * FROM graft.db.t11 TIMESTAMP AS OF '$asOf'")
      .as[(Int, String)].collect().toSeq === Seq((1, "v0")))
    // now → both rows
    val now = fmt.format(new java.util.Date(System.currentTimeMillis() + 1000))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.db.t11 TIMESTAMP AS OF '$now'")
      .as[Long].head() === 2)
    // before the table existed → no snapshot
    val before = fmt.format(new java.util.Date(writeTs.getTime - 3600000))
    intercept[Exception](
      spark.sql(s"SELECT * FROM graft.db.t11 TIMESTAMP AS OF '$before'").collect())
  }

  test("SQL UPDATE on a catalog table routes to the native CoW rewrite") {
    spark.range(0, 100).toDF("id").withColumn("v", lit(0L))
      .writeTo("graft.db.t12").createOrReplace()
    spark.sql("UPDATE graft.db.t12 SET v = id * 10 WHERE id >= 90")
    assert(spark.table("graft.db.t12").filter(col("v") > 0).count() === 10)
    assert(spark.sql("SELECT v FROM graft.db.t12 WHERE id = 95").as[Long].head() === 950L)
    assert(spark.table("graft.db.t12").count() === 100)
  }

  test("DELETE FROM rewrites only files that may match") {
    spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
      .writeTo("graft.db.t8").createOrReplace()
    spark.range(100, 200).toDF("id").withColumn("v", col("id") * 2)
      .writeTo("graft.db.t8").append()
    spark.sql("DELETE FROM graft.db.t8 WHERE id >= 150")
    assert(spark.table("graft.db.t8").count() === 150)
    assert(spark.sql("SELECT max(id) AS m FROM graft.db.t8").as[Long].head() === 149L)
    // delete everything
    spark.sql("DELETE FROM graft.db.t8 WHERE id >= 0")
    assert(spark.table("graft.db.t8").count() === 0)
  }

  test("PARTITIONED BY becomes a persisted cluster spec that prunes reads") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t9")
    spark.sql("CREATE TABLE graft.db.t9 (id BIGINT, v BIGINT) USING graft PARTITIONED BY (id)")
    // three appends; each is range-clustered on id (AQE sizes the files)
    (0 until 3).foreach { i =>
      spark.range(i * 10000L, (i + 1) * 10000L).toDF("id")
        .withColumn("v", col("id") * 2)
        .writeTo("graft.db.t9").append()
    }
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/t9")
    assert(t.clusterSpec() === Seq("id")) // spec survives appends
    assert(t.manifest().size >= 3)
    // clustered writes → disjoint per-file ranges → point lookup = 1 file
    assert(t.prunedManifest(col("id") === 25000L).size === 1)
    assert(spark.sql("SELECT v FROM graft.db.t9 WHERE id = 25000").as[Long].head() === 50000L)
  }

  test("ALTER TABLE SET TBLPROPERTIES: set → survives append → unset") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t10")
    Seq((1, "a")).toDF("id", "v").writeTo("graft.db.t10").createOrReplace()
    spark.sql(
      "ALTER TABLE graft.db.t10 SET TBLPROPERTIES ('classification' = 'parquet', 'team' = 'etl')")
    def props() = spark.sql("SHOW TBLPROPERTIES graft.db.t10")
      .as[(String, String)].collect().toMap
    assert(props().get("classification").contains("parquet"))
    assert(props().get("team").contains("etl"))
    // properties ride subsequent data commits (delta_scd_script.py:43 shape)
    Seq((2, "b")).toDF("id", "v").writeTo("graft.db.t10").append()
    assert(props().get("classification").contains("parquet"))
    assert(spark.table("graft.db.t10").count() === 2)
    spark.sql("ALTER TABLE graft.db.t10 UNSET TBLPROPERTIES ('team')")
    assert(props().get("team").isEmpty)
    assert(props().get("classification").contains("parquet"))
  }

  test("PARTITIONED BY (days(ts)) hidden partitioning prunes raw-timestamp reads") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t14")
    spark.sql(
      "CREATE TABLE graft.db.t14 (ts TIMESTAMP, v BIGINT) USING graft PARTITIONED BY (days(ts))")
    // 8 days of events, written unsorted — the days() transform clusters them
    val df = spark.range(0, 8 * 24).toDF("h")
      .withColumn("ts", expr("timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,h)"))
      .withColumn("v", col("h") * 10).drop("h")
      .orderBy(rand(7)) // deliberately shuffled input
    // tiny fixture: stop AQE folding the 4 range partitions into one file
    // (at real scale AQE's advisory size IS the desired file sizing)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    try df.writeTo("graft.db.t14").append()
    finally spark.conf.unset(coalesceKey)
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/t14")
    assert(t.clusterSpec() === Seq("days(ts)"))
    val all = t.manifest().size
    // a raw ts predicate (no day() rewrite in the query!) prunes files
    val kept = t.prunedManifest(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-07 00:00:00"))).size
    assert(kept < all, s"ts filter kept $kept of $all files")
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.db.t14 WHERE ts >= timestamp'2024-03-07 00:00:00'")
      .as[Long].head() === 48)
  }

  test("PARTITIONED BY bucket(4, id) persists as a bucket cluster spec") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t15")
    spark.sql(
      "CREATE TABLE graft.db.t15 (id BIGINT, v BIGINT) USING graft PARTITIONED BY (bucket(4, id))")
    spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2)
      .writeTo("graft.db.t15").append()
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/t15")
    assert(t.clusterSpec() === Seq("bucket(4, id)"))
    assert(spark.table("graft.db.t15").count() === 1000)
    assert(spark.sql("SELECT v FROM graft.db.t15 WHERE id = 500").as[Long].head() === 1000L)
    // the table reports its spec back as DSv2 partitioning (DESCRIBE /
    // SHOW CREATE round-trip of the hidden-partitioning declaration)
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft.db.t15")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("bucket(4, id)"), desc)
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema without touching data") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t13")
    Seq((1, "a")).toDF("id", "v").writeTo("graft.db.t13").createOrReplace()
    spark.sql("ALTER TABLE graft.db.t13 ADD COLUMNS (score DOUBLE)")
    assert(spark.table("graft.db.t13").schema.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(spark.sql("SELECT score FROM graft.db.t13").as[Option[Double]].collect().toSeq
      === Seq(None))
    spark.sql("INSERT INTO graft.db.t13 VALUES (2, 'b', 7.5)")
    assert(spark.table("graft.db.t13").as[(Int, String, Option[Double])].collect().toSet ===
      Set((1, "a", None), (2, "b", Some(7.5))))
    // lossless widening is metadata-only; lossy retypes stay refused
    spark.sql("ALTER TABLE graft.db.t13 ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("graft.db.t13").schema("id").dataType
      === org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT id FROM graft.db.t13 WHERE id = 1").as[Long].head() === 1L)
    spark.sql("INSERT INTO graft.db.t13 VALUES (9999999999999, 'w', 1.0)")
    assert(spark.table("graft.db.t13").count() === 3)
    intercept[Exception](
      spark.sql("ALTER TABLE graft.db.t13 ALTER COLUMN v TYPE INT"))
    intercept[Exception]( // long → double loses precision: refused
      spark.sql("ALTER TABLE graft.db.t13 ALTER COLUMN id TYPE DOUBLE"))
  }

  test("CHECK constraints via TBLPROPERTIES block violating SQL inserts") {
    spark.sql("DROP TABLE IF EXISTS graft.db.t16")
    Seq((1, 5L)).toDF("id", "v").writeTo("graft.db.t16").createOrReplace()
    spark.sql(
      "ALTER TABLE graft.db.t16 SET TBLPROPERTIES ('graft.constraint.vpos' = 'v > 0')")
    intercept[Exception](spark.sql("INSERT INTO graft.db.t16 VALUES (2, -1)"))
    assert(spark.table("graft.db.t16").count() === 1)
    spark.sql("INSERT INTO graft.db.t16 VALUES (2, 3)")
    assert(spark.table("graft.db.t16").count() === 2)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only, tombstoned against re-add") {
    Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "v", "extra")
      .writeTo("graft.db.dropc").createOrReplace()
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/dropc")
    val filesBefore = t.manifest()
    spark.sql("ALTER TABLE graft.db.dropc DROP COLUMN extra")
    // no data touched; the column is gone from reads but not from history
    assert(t.manifest() === filesBefore)
    assert(spark.table("graft.db.dropc").columns.toSeq === Seq("id", "v"))
    assert(t.readVersion(t.currentVersion() - 1).columns.contains("extra"))
    // appends no longer need (or accept) the dropped column
    Seq((3, "c")).toDF("id", "v").writeTo("graft.db.dropc").append()
    assert(spark.table("graft.db.dropc").count() === 3)
    // re-adding the name is refused while old files may carry stale values
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.dropc ADD COLUMNS (extra BIGINT)"))
    assert(e.getMessage.contains("dropped"))
    // a full rewrite clears the tombstone; the re-added column reads NULL
    t.overwrite(spark.table("graft.db.dropc"))
    spark.sql("ALTER TABLE graft.db.dropc ADD COLUMNS (extra BIGINT)")
    val back = spark.table("graft.db.dropc")
    assert(back.columns.toSeq === Seq("id", "v", "extra"))
    assert(back.filter(col("extra").isNotNull).count() === 0)
    // dropping a column the cluster spec uses is refused — but a column
    // whose name is merely a SUBSTRING of a spec column is fine
    spark.sql("DROP TABLE IF EXISTS graft.db.dropclu")
    spark.sql("CREATE TABLE graft.db.dropclu (video_id BIGINT, id BIGINT, v BIGINT) " +
      "USING graft PARTITIONED BY (video_id)")
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.db.dropclu DROP COLUMN video_id"))
    assert(e2.getMessage.contains("cluster"))
    spark.sql("ALTER TABLE graft.db.dropclu DROP COLUMN id") // substring: allowed
    // a column referenced by a CHECK constraint cannot be dropped
    spark.sql("DROP TABLE IF EXISTS graft.db.dropck")
    Seq((1, 5L)).toDF("id", "v").writeTo("graft.db.dropck").createOrReplace()
    spark.sql("ALTER TABLE graft.db.dropck SET TBLPROPERTIES ('graft.constraint.pos' = 'v > 0')")
    val e3 = intercept[Exception](spark.sql("ALTER TABLE graft.db.dropck DROP COLUMN v"))
    assert(e3.getMessage.contains("constraint"))
  }

  test("dropped-column tombstone blocks every schema-widening path") {
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "v", "extra")
      .writeTo("graft.db.resur").createOrReplace()
    spark.sql("ALTER TABLE graft.db.resur DROP COLUMN extra")
    val t = graft.tables.SnapshotTable(spark, wh + "/db/resur")
    // append(mergeSchema=true) with the dropped name must refuse
    val e1 = intercept[Exception](
      t.append(Seq((3, "c", 30L)).toDF("id", "v", "extra"), mergeSchema = true))
    assert(e1.getMessage.contains("dropped"))
    // MERGE WITH SCHEMA EVOLUTION with the dropped name must refuse
    GraftCatalog.register("resur_reg", t)
    Seq((2, "b2", 99L)).toDF("id", "v", "extra").createOrReplaceTempView("resur_src")
    val e2 = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO resur_reg t USING resur_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e2.getMessage.contains("dropped"))
    // table unchanged by the refused writes
    assert(spark.table("graft.db.resur").columns.toSeq === Seq("id", "v"))
    assert(t.read().count() === 2)
  }

  test("unfiltered count(*) answers from manifest stats, no scan") {
    (1 to 1234).map(i => (i, s"v$i")).toDF("id", "v")
      .writeTo("graft.db.cnt").createOrReplace()
    Seq((1235, "x")).toDF("id", "v").writeTo("graft.db.cnt").append()

    val metaCount = spark.sql("SELECT count(*) AS n, count(1) AS m FROM graft.db.cnt")
    assert(metaCount.as[(Long, Long)].head() === ((1235L, 1235L)))
    assert(hasLocalRelation(metaCount), "count(*) must come from the manifest")

    // a filter keeps the scan — and stays correct
    val filtered = spark.sql("SELECT count(*) AS n FROM graft.db.cnt WHERE id <= 10")
    assert(filtered.as[Long].head() === 10L)
    assert(!hasLocalRelation(filtered))

    // count(col) = Σ (rows − nullCount): the optimizer rule serves it
    // too since r15 (collapses to a LocalRelation before the DSv2
    // layer, which still serves catalog-only deployments)
    val colCount = spark.sql("SELECT count(v) AS n FROM graft.db.cnt")
    assert(colCount.as[Long].head() === 1235L)
    assert(hasLocalRelation(colCount))

    // the rule honors a pinned time-travel snapshot
    val v0 = spark.sql("SELECT count(*) AS n FROM graft.db.cnt VERSION AS OF 1")
    assert(v0.as[Long].head() === 1234L)
    assert(hasLocalRelation(v0))

    // min/max of numeric columns answer from footer bounds, mixed with count
    val mm = spark.sql("SELECT min(id) AS lo, max(id) AS hi, count(*) AS n FROM graft.db.cnt")
    assert(mm.as[(Int, Int, Long)].head() === ((1, 1235, 1235L)))
    assert(hasLocalRelation(mm), "min/max must come from the manifest")

    // min/max over strings serves when EVERY file's bounds carry the
    // writer-exact flag (r15 — q134's rule in the Catalyst collapse);
    // unflagged (possibly truncated) bounds still refuse, pinned by the
    // flag-stripping specs
    val sm = spark.sql("SELECT max(v) AS hi FROM graft.db.cnt")
    assert(sm.as[String].head() === "x") // the appended (1235, "x") row
    assert(hasLocalRelation(sm))

    // a projected alias shadowing a real column must not hit its stats
    val shadow = spark.sql(
      "SELECT max(id) AS hi FROM (SELECT -id AS id FROM graft.db.cnt)")
    assert(shadow.as[Int].head() === -1)
    assert(!hasLocalRelation(shadow))
  }

  test("metadata min/max: timestamps, NULL columns, all-NULL columns") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("ts", TimestampType),
      StructField("maybe", LongType), StructField("void", DoubleType)))
    val rows = (1 to 100).map { i =>
      Row(i, java.sql.Timestamp.valueOf(f"2024-03-${i % 28 + 1}%02d 10:00:00"),
        if (i % 3 == 0) null else java.lang.Long.valueOf(i * 10L), null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      .writeTo("graft.db.mmts").createOrReplace()

    val watermark = spark.sql("SELECT max(ts) AS hwm FROM graft.db.mmts")
    assert(watermark.as[java.sql.Timestamp].head() ===
      java.sql.Timestamp.valueOf("2024-03-28 10:00:00"))
    assert(hasLocalRelation(watermark), "the watermark query must be metadata-only")

    // nulls are ignored by min/max — and the bounds still come from stats
    val m = spark.sql("SELECT min(maybe) AS lo, max(maybe) AS hi FROM graft.db.mmts")
    assert(m.as[(Long, Long)].head() === ((10L, 1000L)))
    assert(hasLocalRelation(m))

    // an all-NULL column answers NULL from nullCount == rows
    val v = spark.sql("SELECT max(void) AS hi FROM graft.db.mmts")
    assert(v.head().isNullAt(0))
    assert(hasLocalRelation(v))
  }

  test("REPLACE WHERE and writeTo.overwrite(cond) route to overwriteWhere") {
    (0 until 100).map(i => (i, if (i < 50) "a" else "b")).toDF("id", "part")
      .writeTo("graft.db.rw").createOrReplace()

    // SQL REPLACE WHERE: swap partition 'b' for two rows, one commit
    spark.sql(
      "INSERT INTO graft.db.rw REPLACE WHERE part = 'b' VALUES (900, 'b'), (901, 'b')")
    val afterSql = spark.table("graft.db.rw").as[(Int, String)].collect()
    assert(afterSql.count(_._2 == "a") === 50)
    assert(afterSql.filter(_._2 == "b").map(_._1).sorted.toSeq === Seq(900, 901))

    // DataFrame writeTo.overwrite(condition)
    Seq((1000, "a")).toDF("id", "part")
      .writeTo("graft.db.rw").overwrite(col("part") === "a")
    val afterDf = spark.table("graft.db.rw").as[(Int, String)].collect()
    assert(afterDf.filter(_._2 == "a").map(_._1).toSeq === Seq(1000))
    assert(afterDf.filter(_._2 == "b").map(_._1).sorted.toSeq === Seq(900, 901))

    // rows outside the declared scope are rejected (raise_error guard in
    // the write projection; message surfaces somewhere in the cause chain)
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.rw REPLACE WHERE part = 'a' VALUES (7, 'b')")
    }
    val chain = Iterator.iterate(bad: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("satisfy"), s"unexpected failure: $chain")
  }

  test("DSv2 metadata scan: count(col) mixes, with conservative refusals") {
    val df = (1 to 500).map(i => (i, if (i % 5 == 0) null else s"v$i")).toDF("id", "v")
    df.writeTo("graft.db.cagg").createOrReplace()

    // the whole mix — count(col) from rows/nullCount, count(*), bounds —
    // collapses to a LocalRelation (r15: the optimizer rule serves
    // count(col) too; the DSv2 layer remains for catalog-only sessions)
    val q = spark.sql(
      "SELECT count(v) AS nv, count(*) AS n, min(id) AS lo, max(id) AS hi FROM graft.db.cagg")
    assert(q.as[(Long, Long, Int, Int)].head() === ((400L, 500L, 1, 500)))
    val plan = executedPlanString(q)
    assert(hasLocalRelation(q), s"expected manifest-collapsed agg:\n$plan")
    assert(!plan.contains("Location: InMemoryFileIndex"), "no parquet scan expected")

    // a filter keeps the real scan — and stays correct
    val f = spark.sql("SELECT count(v) AS nv FROM graft.db.cagg WHERE id <= 10")
    assert(f.as[Long].head() === 8L) // v is NULL at 5 and 10
    assert(!executedPlanString(f).contains("GraftMetadataAgg"))

    // GROUP BY keeps the real scan
    val g = spark.sql("SELECT id % 2 AS p, count(v) AS nv FROM graft.db.cagg GROUP BY 1")
    assert(g.orderBy("p").as[(Int, Long)].collect().toSeq === Seq((0, 200L), (1, 200L)))
    assert(!executedPlanString(g).contains("GraftMetadataAgg"))

    // a column added later has no stats in pre-evolution files: the
    // metadata path must refuse (NULLs there are implicit, not counted)
    spark.sql("ALTER TABLE graft.db.cagg ADD COLUMNS (w STRING)")
    Seq((501, "x", "w1")).toDF("id", "v", "w").writeTo("graft.db.cagg").append()
    val cw = spark.sql("SELECT count(w) AS nw FROM graft.db.cagg")
    assert(cw.as[Long].head() === 1L)
    assert(!executedPlanString(cw).contains("GraftMetadataAgg"))

    // time travel: the pinned snapshot's manifest answers
    val tt = spark.sql("SELECT count(v) AS nv FROM graft.db.cagg VERSION AS OF 1")
    assert(tt.as[Long].head() === 400L)
    assert(hasLocalRelation(tt) ||
      executedPlanString(tt).contains("GraftMetadataAgg"))
  }

  test("ALTER TABLE RENAME COLUMN: SQL reads, pushdown, and writes follow") {
    spark.range(0, 300).toDF("id")
      .withColumn("v", concat(lit("p"), col("id")))
      .repartitionByRange(3, col("id"))
      .writeTo("graft.db.ren").createOrReplace()
    spark.sql("ALTER TABLE graft.db.ren RENAME COLUMN id TO key")
    assert(spark.table("graft.db.ren").schema.fieldNames.toSeq === Seq("key", "v"))
    // filter on the renamed column reads the right data (physical name
    // translated into the parquet scan + row-group pushdown)
    val q = spark.sql("SELECT v FROM graft.db.ren WHERE key = 7")
    assert(q.as[String].head() === "p7")
    val plan = executedPlanString(q)
    assert(plan.contains("PushedFilters:") && plan.contains("id"),
      s"expected physical-name pushdown in:\n$plan")
    // column pruning still reaches the scan (physical names in ReadSchema)
    assert(executedPlanString(spark.sql("SELECT v FROM graft.db.ren"))
      .contains("ReadSchema: struct<v:string>"))
    // DSv2 writes after the rename land physically consistent
    Seq((1000L, "new")).toDF("key", "v").writeTo("graft.db.ren").append()
    assert(spark.sql("SELECT v FROM graft.db.ren WHERE key = 1000")
      .as[String].head() === "new")
    // time travel before the rename still shows the old name
    assert(spark.sql("SELECT * FROM graft.db.ren VERSION AS OF 0").schema
      .fieldNames.toSeq === Seq("id", "v"))
    // metadata-only count still answers from the manifest
    val cnt = spark.sql("SELECT count(*) FROM graft.db.ren")
    assert(hasLocalRelation(cnt) && cnt.as[Long].head() === 301L)
  }

  test("deletion vectors serve through the catalog scan, incl. under RENAME COLUMN") {
    // the DSv2 scan applies DV sidecar positions inside its readers
    // (DvFilteredScan); previously a DV'd snapshot refused catalog reads
    spark.sql("DROP TABLE IF EXISTS graft.db.dvcat")
    spark.sql("CREATE TABLE graft.db.dvcat (id BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('graft.dv.enabled'='true')")
    spark.range(0, 500).select(col("id"), concat(lit("x"), col("id")).as("v"))
      .repartitionByRange(4, col("id"))
      .writeTo("graft.db.dvcat").append()
    spark.sql("DELETE FROM graft.db.dvcat WHERE id % 7 = 2")
    val expect = (0L until 500L).filterNot(_ % 7 == 2)
    assert(spark.sql("SELECT id FROM graft.db.dvcat").as[Long].collect().sorted
      === expect.toArray)
    // matches the table API's own DV-applying read exactly
    val apiIds = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/dvcat")
      .read().select("id").as[Long].collect().sorted
    assert(apiIds === expect.toArray)
    // pushed filter on a deleted key returns nothing; a live key serves
    assert(spark.sql("SELECT v FROM graft.db.dvcat WHERE id = 2").collect().isEmpty)
    assert(spark.sql("SELECT v FROM graft.db.dvcat WHERE id = 3")
      .as[String].head() === "x3")
    // DV filtering composes with column mapping: physical scan drops
    // positions, logical names report on top
    spark.sql("ALTER TABLE graft.db.dvcat RENAME COLUMN id TO key")
    spark.sql("DELETE FROM graft.db.dvcat WHERE key % 7 = 3")
    val expect2 = (0L until 500L).filterNot(i => i % 7 == 2 || i % 7 == 3)
    assert(spark.sql("SELECT key FROM graft.db.dvcat").as[Long].collect().sorted
      === expect2.toArray)
    assert(spark.sql("SELECT count(*) AS c FROM graft.db.dvcat")
      .as[Long].head() === expect2.size.toLong)
    spark.sql("DROP TABLE graft.db.dvcat")
  }

  test("DV positions stay exact under parquet row-group skipping") {
    // the interaction where a naive row counter would silently corrupt:
    // a pushed predicate makes the reader SKIP early row groups, and the
    // DV filter must still see each surviving row's true file position
    // (Spark's row-index generators account for skipped groups; this
    // pins that the DSv2 DV path actually rides them). Tiny parquet
    // block size → many row groups per file over sorted ids.
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setLong("parquet.block.size", 65536)
    try {
      spark.sql("DROP TABLE IF EXISTS graft.db.dvrg")
      spark.sql("CREATE TABLE graft.db.dvrg (id BIGINT, v STRING) USING graft " +
        "TBLPROPERTIES ('graft.dv.enabled'='true')")
      spark.range(0, 60000)
        .select(col("id"), concat(lit("xyz"), col("id")).as("v"))
        .repartitionByRange(2, col("id"))
        .sortWithinPartitions("id")
        .writeTo("graft.db.dvrg").append()
      // one deleted id inside the predicate's range, one in the skipped
      // range — only the first must vanish from the filtered read
      spark.sql("DELETE FROM graft.db.dvrg WHERE id = 55500 OR id = 100")
      val t = graft.tables.SnapshotTable(spark,
        spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/dvrg")
      assert(t.dvManifest().nonEmpty)
      val got = spark.sql("SELECT id FROM graft.db.dvrg WHERE id >= 55000")
        .as[Long].collect().sorted
      assert(got === (55000L until 60000L).filterNot(_ == 55500L).toArray,
        s"row-group-skipped DV read diverged (${got.length} rows)")
      assert(spark.sql("SELECT count(*) AS c FROM graft.db.dvrg")
        .as[Long].head() === 59998L)
      spark.sql("DROP TABLE graft.db.dvrg")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
  }

  test("a doomed multi-change ALTER leaves no partial state") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    spark.sql("CREATE TABLE graft.alterns.pv (id INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft.alterns.pv VALUES (1, 'a')")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftTableCatalog]
    val ident = Identifier.of(Array("alterns"), "pv")
    val before = spark.sql("SHOW TBLPROPERTIES graft.alterns.pv").count()
    // SetProperty would succeed alone; the invalid narrowing must stop
    // the whole statement BEFORE the property commits
    intercept[Exception](cat.alterTable(ident,
      TableChange.setProperty("graft.note", "x"),
      TableChange.updateColumnType(Array("id"),
        org.apache.spark.sql.types.ByteType))) // int -> byte: narrowing
    assert(spark.sql("SHOW TBLPROPERTIES graft.alterns.pv").count() === before)
    // same for a typo'd drop column
    intercept[Exception](cat.alterTable(ident,
      TableChange.setProperty("graft.note", "x"),
      TableChange.deleteColumn(Array("nope"), false)))
    assert(spark.sql("SHOW TBLPROPERTIES graft.alterns.pv").count() === before)
  }

  test("VERSION AS OF rejects junk versions with a clear error") {
    spark.sql("CREATE TABLE graft.alterns.tt (id INT) USING parquet")
    spark.sql("INSERT INTO graft.alterns.tt VALUES (1)")
    val bad = intercept[Exception](
      spark.sql("SELECT * FROM graft.alterns.tt VERSION AS OF 999").collect())
    assert(bad.getMessage.contains("no version"), bad.getMessage)
  }

  test("TRUNCATE TABLE empties the table as a new versioned commit") {
    Seq((1, "a"), (2, "b")).toDF("id", "v").writeTo("graft.db.trunc").createOrReplace()
    spark.sql("TRUNCATE TABLE graft.db.trunc")
    assert(spark.table("graft.db.trunc").count() === 0)
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/trunc")
    // truncation is a commit, not an erasure: time travel still works
    assert(t.readVersion(t.currentVersion() - 1).count() === 2)
    // and the table remains writable with the same schema
    spark.sql("INSERT INTO graft.db.trunc VALUES (9, 'z')")
    assert(spark.table("graft.db.trunc").as[(Int, String)].collect().toSeq === Seq((9, "z")))
  }

  test("drop table removes it; load after drop fails") {
    Seq((1, "a")).toDF("id", "v").writeTo("graft.db.t6").createOrReplace()
    spark.sql("DROP TABLE graft.db.t6")
    val e = intercept[Exception](spark.table("graft.db.t6").collect())
    assert(e.getMessage.toLowerCase.contains("table") )
  }

  test("column DEFAULT values: create, insert, DEFAULT keyword, ALTER backfill") {
    spark.sql("DROP TABLE IF EXISTS graft.db.defs")
    spark.sql(
      """CREATE TABLE graft.db.defs (
        |  id INT, status STRING DEFAULT 'new', score DOUBLE DEFAULT 1.5
        |) USING graft""".stripMargin)
    spark.sql("INSERT INTO graft.db.defs (id) VALUES (1)")
    spark.sql("INSERT INTO graft.db.defs VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO graft.db.defs VALUES (3, 'done', 9.0)")
    // a column added WITH a default: rows written before the column
    // existed read the exists-default (not NULL); later inserts fill it
    spark.sql("ALTER TABLE graft.db.defs ADD COLUMN tag STRING DEFAULT 'none'")
    spark.sql("INSERT INTO graft.db.defs (id) VALUES (4)")
    val got = spark.table("graft.db.defs")
      .as[(Int, String, Double, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1, "new", 1.5, "none"),
      (2, "new", 1.5, "none"),
      (3, "done", 9.0, "none"),
      (4, "new", 1.5, "none")))
  }

  test("identity columns: assigned past the high-water mark, ALWAYS rejects explicit") {
    spark.sql("DROP TABLE IF EXISTS graft.db.idt")
    spark.sql(
      """CREATE TABLE graft.db.idt (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
        |  v STRING
        |) USING graft""".stripMargin)
    spark.sql("INSERT INTO graft.db.idt (v) VALUES ('a'), ('b'), ('c')")
    val batch1 = spark.table("graft.db.idt").as[(Long, String)].collect().toSeq
    assert(batch1.map(_._1).distinct.size === 3, "ids must be unique")
    assert(batch1.map(_._1).forall(i => i >= 100 && (i - 100) % 3 == 0),
      s"ids align to start/step: $batch1")
    // the next batch starts past the table's maximum (stats-derived basis)
    spark.sql("INSERT INTO graft.db.idt (v) VALUES ('d'), ('e')")
    val all = spark.table("graft.db.idt").as[(Long, String)].collect().toSeq
    val batch2 = all.filter(r => Set("d", "e")(r._2)).map(_._1)
    assert(all.map(_._1).distinct.size === 5, s"ids unique across batches: $all")
    assert(batch2.min > batch1.map(_._1).max, "second batch continues past the first")
    // GENERATED ALWAYS: explicit values rejected, nothing committed
    val before = spark.table("graft.db.idt").count()
    val e = intercept[Exception](spark.sql("INSERT INTO graft.db.idt VALUES (7, 'x')"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("GENERATED ALWAYS")), s"got: ${msgs(e)}")
    assert(spark.table("graft.db.idt").count() === before)
    // BY DEFAULT accepts explicit values and still fills omitted ones
    spark.sql("DROP TABLE IF EXISTS graft.db.idd")
    spark.sql(
      """CREATE TABLE graft.db.idd (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING
        |) USING graft""".stripMargin)
    spark.sql("INSERT INTO graft.db.idd VALUES (500, 'x')")
    spark.sql("INSERT INTO graft.db.idd (v) VALUES ('y')")
    val dd = spark.table("graft.db.idd").as[(Long, String)].collect()
      .map(kv => kv._2 -> kv._1).toMap
    assert(dd("x") === 500L)
    assert(dd("y") > 500L, s"omitted id continues past the explicit one: $dd")
    // internal rewrites must NOT trip GENERATED ALWAYS: an UPDATE (CoW
    // rewrite) and a compaction both re-write rows carrying their ids
    val idsBefore = spark.table("graft.db.idt").as[(Long, String)].collect()
      .map(kv => kv._2 -> kv._1).toMap
    spark.sql("UPDATE graft.db.idt SET v = concat(v, '!') WHERE v = 'a'")
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/idt")
    t.compact(targetFileBytes = 1024 * 1024, smallFileBytes = 1024 * 1024)
    val after = spark.table("graft.db.idt").as[(Long, String)].collect()
      .map(kv => kv._2.stripSuffix("!") -> kv._1).toMap
    assert(after === idsBefore, "rewrites must preserve assigned ids")
  }

  test("GENERATED ALWAYS AS: computed on every path, conflicts rejected") {
    spark.sql("DROP TABLE IF EXISTS graft.db.gen")
    spark.sql(
      """CREATE TABLE graft.db.gen (
        |  id INT, name STRING,
        |  checksum STRING GENERATED ALWAYS AS (md5(concat(name, '!'))),
        |  doubled INT GENERATED ALWAYS AS (id * 2)
        |) USING graft""".stripMargin)
    // omitted by name-list INSERT → computed
    spark.sql("INSERT INTO graft.db.gen (id, name) VALUES (1, 'a')")
    // provided and MATCHING → accepted
    spark.sql("INSERT INTO graft.db.gen VALUES (2, 'b', md5('b!'), 4)")
    // DataFrame append omitting the generated columns → computed
    Seq((3, "c")).toDF("id", "name").writeTo("graft.db.gen").append()
    val got = spark.table("graft.db.gen")
      .as[(Int, String, String, Int)].collect().sortBy(_._1).toSeq
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s + "!")
    assert(got === Seq((1, "a", m("a"), 2), (2, "b", m("b"), 4), (3, "c", m("c"), 6)))
    // provided and CONFLICTING → the write fails and nothing commits
    val before = spark.table("graft.db.gen").count()
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.db.gen VALUES (9, 'z', 'wrong', 99)"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("generated column")), s"got: ${msgs(e)}")
    assert(spark.table("graft.db.gen").count() === before, "failed write must not commit")
    // the property view documents the expressions
    val props = spark.sql("SHOW TBLPROPERTIES graft.db.gen").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.generated.doubled").contains("id * 2"))
    // the API path honors the same property contract
    val t = graft.tables.SnapshotTable(spark,
      spark.conf.get("spark.sql.catalog.graft.warehouse") + "/db/gen")
    t.append(Seq((4, "d")).toDF("id", "name"))
    assert(spark.table("graft.db.gen").count() === 4)
    assert(spark.table("graft.db.gen").filter(col("id") === 4)
      .select("checksum", "doubled").as[(String, Int)].head() === ((m("d"), 8)))
  }

  test("MoR _ro/_rt faces: read-optimized vs real-time by table NAME") {
    // Hudi hive-sync parity: an MoR table answers to t_ro (base files
    // only, pending deltas invisible) and t_rt (merged view) in SQL
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    Seq((1, "a", 1L), (2, "b", 1L)).toDF("id", "v", "ts")
      .writeTo("graft.db.mor1").createOrReplace()
    val t = graft.tables.SnapshotTable(spark, s"$wh/db/mor1")
    t.upsertDeferred(Seq((2, "b2", 2L), (3, "c", 2L)).toDF("id", "v", "ts"),
      Seq("id"), "ts")
    // the PLAIN name still refuses while deltas are pending (serving the
    // stale base silently is the one wrong answer)...
    val e = intercept[Exception](spark.table("graft.db.mor1").collect())
    assert(e.getMessage.contains("pending MoR deltas"))
    // ...the _ro face serves exactly the base (staleness is its contract)
    assert(spark.table("graft.db.mor1_ro").as[(Int, String, Long)].collect().toSet ===
      Set((1, "a", 1L), (2, "b", 1L)))
    // ...and the _rt face serves the merged view, filterable/joinable SQL
    assert(spark.table("graft.db.mor1_rt").as[(Int, String, Long)].collect().toSet ===
      Set((1, "a", 1L), (2, "b2", 2L), (3, "c", 2L)))
    assert(spark.sql("SELECT v FROM graft.db.mor1_rt WHERE id = 2")
      .as[String].head() === "b2")
    // after compaction the three names coincide
    t.applyDeltas()
    assert(spark.table("graft.db.mor1").count() === 3)
    assert(spark.table("graft.db.mor1_ro").as[(Int, String, Long)].collect().toSet ===
      spark.table("graft.db.mor1_rt").as[(Int, String, Long)].collect().toSet)
    // a PHYSICAL table whose name happens to end in _rt wins resolution
    Seq((7, "x")).toDF("id", "v").writeTo("graft.db.real_rt").createOrReplace()
    assert(spark.table("graft.db.real_rt").as[(Int, String)].collect().toSet ===
      Set((7, "x")))
    // faces never conjure a table that does not exist
    intercept[Exception](spark.table("graft.db.nothere_rt").collect())
    // faces are READ surfaces: DML addressed to a face is a misdirected
    // write, rejected instead of silently mutating the base table
    val w = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.mor1_ro VALUES (8, 'h', 3)")
    }
    assert(w.getMessage.contains("read-optimized face") ||
      w.getMessage.contains("does not support"), w.getMessage)
    assert(spark.table("graft.db.mor1").count() === 3)
    // time travel resolves on faces too: relative to the post-fold head,
    // cur-1 carries the pending overlay and cur-2 is the pre-delta base
    // — each face serves its own view of the pinned snapshot
    val cur = t.currentVersion()
    val roPre = spark.sql(
        s"SELECT id, v, ts FROM graft.db.mor1_ro VERSION AS OF ${cur - 2}")
      .as[(Int, String, Long)].collect().toSet
    assert(roPre === Set((1, "a", 1L), (2, "b", 1L)))
    val rtOverlay = spark.sql(
        s"SELECT id, v, ts FROM graft.db.mor1_rt VERSION AS OF ${cur - 1}")
      .as[(Int, String, Long)].collect().toSet
    assert(rtOverlay === Set((1, "a", 1L), (2, "b2", 2L), (3, "c", 2L)))
    // the rt face's V1 bridge hands translated filters + the projection
    // back into the merged-view plan: translatable conjuncts,
    // untranslatable ones (Spark re-applies them above), and projection
    // order all behave
    assert(spark.sql(
        "SELECT ts, v FROM graft.db.mor1_rt WHERE id % 2 = 1 AND id <= 3")
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "c")))
    // ...and the pushdown is REAL, twice over: (1) the planner consults
    // the face's ScanBuilder — the physical scan advertises the pushed
    // predicate — and (2) the captured filters/projection apply INSIDE
    // buildScan (driving the builder directly returns already-filtered,
    // already-pruned rows; no outer Filter exists to mask a no-op)
    // no IsNotNull(id): maintenance rewrites (the applyDeltas fold)
    // commit the PRIOR schema, so `id` stays non-nullable and Catalyst
    // never manufactures the redundant null check
    val facePlan = executedPlanString(
      spark.sql("SELECT v FROM graft.db.mor1_rt WHERE id = 2"))
    assert(facePlan.contains("PushedFilters: [EqualTo(id,2)]"),
      facePlan)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val rt = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "mor1_rt"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val sb = rt.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(org.apache.spark.sql.sources.EqualTo("id", 2)))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
      .pruneColumns(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val rel = sb.build().asInstanceOf[org.apache.spark.sql.connector.read.V1Scan]
      .toV1TableScan[org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan](spark.sqlContext)
    val inner = rel.buildScan().collect()
    assert(inner.length === 1 && inner.head.length === 1 &&
      inner.head.getString(0) === "b2", inner.toSeq.toString)
  }
}
