package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.SnapshotTable

/**
 * Cross-session catalog persistence — the hive-sync/Glue role
 * (reference `hudi/hudi_scd_script.py:35-40`): a table registered under
 * a name by one session must resolve by NAME in a session built later,
 * with nothing carried over but the warehouse directory. Sessions are
 * modeled with `spark.newSession()` — a fresh SessionState whose
 * catalogs re-instantiate from conf, so the ONLY channel to the new
 * session is the on-disk [[CatalogRegistry]] (the same bytes a separate
 * JVM would read).
 */
class CatalogPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse: String = spark.conf.get("spark.sql.catalog.graft.warehouse")

  test("external LOCATION table: create in one session, resolve by name in a fresh one") {
    val loc = tmpDir("catreg") + "/contact_ext"
    spark.sql(s"CREATE TABLE graft.db.ext1 (id INT, v STRING) USING graft LOCATION '$loc'")
    spark.sql("INSERT INTO graft.db.ext1 VALUES (1, 'a'), (2, 'b')")
    // the data really lives at the external root, not in the warehouse
    assert(SnapshotTable(spark, loc).currentVersion() >= 0)

    val s2 = spark.newSession()
    assert(s2.sql("SELECT id, v FROM graft.db.ext1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "a"), (2, "b")))
    // writes through the fresh session land in the same external table
    s2.sql("INSERT INTO graft.db.ext1 VALUES (3, 'c')")
    assert(spark.table("graft.db.ext1").count() === 3)
    // time travel resolves through the registry too
    assert(s2.sql("SELECT count(*) AS c FROM graft.db.ext1 VERSION AS OF 1")
      .head().getLong(0) === 2)
  }

  test("_rt/_ro faces of a registered external table serve from a fresh session") {
    val loc = tmpDir("catreg_mor") + "/mor_ext"
    val t = SnapshotTable.create(spark, loc,
      Seq((1, "a", 0L), (2, "b", 0L)).toDF("id", "v", "ts"))
    t.upsertDeferred(Seq((2, "b2", 1L)).toDF("id", "v", "ts"),
      keys = Seq("id"), precombine = "ts")
    // hive-sync registration of an existing table = CREATE … LOCATION
    // with no column list (adoption)
    spark.sql(s"CREATE TABLE graft.db.morext1 USING graft LOCATION '$loc'")

    val s2 = spark.newSession()
    val rt = s2.sql("SELECT id, v FROM graft.db.morext1_rt ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rt === Seq((1, "a"), (2, "b2"))) // real-time: delta applied
    val ro = s2.sql("SELECT id, v FROM graft.db.morext1_ro ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(ro === Seq((1, "a"), (2, "b"))) // read-optimized: base only
  }

  test("adoption validates a declared schema against the committed one") {
    val loc = tmpDir("catreg_adopt") + "/t"
    SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.db.bad1 (id STRING, v STRING) USING graft LOCATION '$loc'")
    }
    assert(e.getMessage.contains("does not match the committed schema"))
    // matching declared schema adopts fine
    spark.sql(s"CREATE TABLE graft.db.ok1 (id INT, v STRING) USING graft LOCATION '$loc'")
    assert(spark.table("graft.db.ok1").count() === 1)
  }

  test("DROP of a registered external table unregisters but leaves the data") {
    val loc = tmpDir("catreg_drop") + "/t"
    SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    spark.sql(s"CREATE TABLE graft.db.dropme USING graft LOCATION '$loc'")
    assert(spark.table("graft.db.dropme").count() === 1)
    spark.sql("DROP TABLE graft.db.dropme")
    intercept[Exception](spark.table("graft.db.dropme").collect())
    // external data untouched — the catalog never owned it
    assert(SnapshotTable(spark, loc).read().count() === 1)
  }

  test("listTables includes registered external tables") {
    val loc = tmpDir("catreg_list") + "/t"
    SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    spark.sql(s"CREATE TABLE graft.listns.lx USING graft LOCATION '$loc'")
    val s2 = spark.newSession()
    val names = s2.sql("SHOW TABLES IN graft.listns").collect().map(_.getString(1)).toSet
    assert(names.contains("lx"))
  }

  test("metadata TVFs address tables by catalog name, registry-resolved") {
    val loc = tmpDir("catreg_tvf") + "/t"
    val t = SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    spark.sql(s"CREATE TABLE graft.db.tvf1 USING graft LOCATION '$loc'")
    val s2 = spark.newSession()
    // files metadata by NAME — the path never appears in the query
    assert(s2.sql("SELECT * FROM graft_table_files('graft.db.tvf1')").count() === 2)
    // change feed by NAME: (from, to] is from-EXCLUSIVE, so from=0
    // yields exactly version 1's (2, 'b') append
    val changes = s2.sql(
      "SELECT id, v FROM graft_table_changes('graft.db.tvf1', 0)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(changes === Set((2, "b")))
    // a path argument still works verbatim
    assert(s2.sql(s"SELECT * FROM graft_table_files('$loc')").count() === 2)
  }

  test("maintenance SQL addresses registered external tables by name") {
    val loc = tmpDir("catreg_maint") + "/t"
    val t = SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    spark.sql(s"CREATE TABLE graft.db.maint1 USING graft LOCATION '$loc'")
    val s2 = spark.newSession()
    // history, optimize, and vacuum dry-run all resolve through the
    // registry — the path never appears in the SQL
    assert(s2.sql("DESCRIBE HISTORY graft.db.maint1").count() >= 2)
    s2.sql("OPTIMIZE graft.db.maint1")
    assert(s2.sql("SELECT * FROM graft.db.maint1").count() === 2)
    assert(SnapshotTable(spark, loc).commitEntry(
      SnapshotTable(spark, loc).currentVersion()).action.startsWith("compact"))
    s2.sql("VACUUM graft.db.maint1 RETAIN 168 HOURS DRY RUN")
  }

  test("DROP clears a stale same-name registration alongside the managed dir") {
    // the resurrection case: a name registered externally AND a managed
    // table later materialized at the derived warehouse path — DROP
    // must clear both, or the dropped name resolves again via the
    // leftover registration
    val loc = tmpDir("catreg_stale") + "/ext"
    SnapshotTable.create(spark, loc, Seq((9, "ext")).toDF("id", "v"))
    CatalogRegistry.register(spark, warehouse, Seq("db", "stale1"), loc)
    Seq((1, "managed")).toDF("id", "v").writeTo("graft.db.stale1").createOrReplace()
    // managed path wins while both exist
    assert(spark.table("graft.db.stale1").as[(Int, String)].head() === ((1, "managed")))
    spark.sql("DROP TABLE graft.db.stale1")
    intercept[Exception](spark.table("graft.db.stale1").collect())
    assert(CatalogRegistry.lookup(spark, warehouse, Seq("db", "stale1")).isEmpty)
  }

  test("registry keys are locale-independent (Locale.ROOT lowering)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // under the Turkish default locale "IDS".toLowerCase is "ıds" —
      // Locale.ROOT keying must still produce the portable "ids"
      assert(CatalogRegistry.key(Seq("DB", "IDS")) === "db.ids")
    } finally java.util.Locale.setDefault(prev)
  }

  test("registry log stays bounded and hint-probed across many registrations") {
    val wh = tmpDir("catreg_retention") // private warehouse: slot counts are exact
    val loc = tmpDir("catreg_ret_data") + "/t"
    SnapshotTable.create(spark, loc, Seq((1, "a")).toDF("id", "v"))
    (0 until 40).foreach(i =>
      CatalogRegistry.register(spark, wh, Seq("retns", s"t$i"), loc))
    // every registration still resolves from the retained head
    (0 until 40).foreach(i =>
      assert(CatalogRegistry.lookup(spark, wh, Seq("retns", s"t$i")) === Some(loc)))
    // superseded slots were pruned — the log is bounded, not O(#registrations)
    val dir = new java.io.File(wh, "_registry")
    val slots = dir.listFiles().map(_.getName).filter(_.matches("v\\d+\\.json"))
    assert(slots.length <= 17, s"log not pruned: ${slots.length} slots")
    // and the hint points at a live head (probe path, no listing needed)
    assert(new java.io.File(dir, "_latest_hint").exists())
    // a stale hint self-heals: overwrite it with an old version
    val out = new java.io.FileOutputStream(new java.io.File(dir, "_latest_hint"))
    out.write("25".getBytes("UTF-8")); out.close()
    assert(CatalogRegistry.lookup(spark, wh, Seq("retns", "t39")) === Some(loc))
  }

  test("registry survives concurrent registration from racing threads") {
    val wh = warehouse
    val roots = (0 until 16).map { i =>
      val loc = tmpDir(s"catreg_race$i") + "/t"
      SnapshotTable.create(spark, loc, Seq((i, s"v$i")).toDF("id", "v"))
      (s"race$i", loc)
    }
    val threads = roots.map { case (name, loc) =>
      new Thread(() =>
        CatalogRegistry.register(spark, wh, Seq("racens", name), loc))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // every racer's registration landed (CAS losers retried on top of winners)
    roots.foreach { case (name, loc) =>
      assert(CatalogRegistry.lookup(spark, wh, Seq("racens", name)) === Some(loc),
        s"registration lost for $name")
    }
    // and they all resolve as tables in a fresh session
    val s2 = spark.newSession()
    assert(s2.table("graft.racens.race7").count() === 1)
  }
}
