package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.tables.SnapshotTable

/**
 * Driver contract (SURVEY.md §2.5): every declared query runs on this
 * engine over the per-scale parquet tables AND as ANSI SQL on a DuckDB
 * oracle; the
 * result sets must hash-match. Conventions: total-order ORDER BY on every
 * query; aggregate outputs cast to fixed types so both engines agree on
 * the result schema; aliases identical on both sides (the driver sorts
 * columns by name before hashing).
 */
object SparkEntry {

  /** Tables the driver ships per scale dir (TESTDATA.md). */
  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Temp-dir registry with a JVM shutdown hook: every fixture dir this
   *  process creates is reclaimed on exit. A day of bench/verify runs
   *  left 79 GB of orphaned fixture dirs and filled the disk MID-RUN
   *  (round 15) — per-process warm reuse still works (deletion happens
   *  only at exit), crashed runs clean up too. */
  private val tmpRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val tmpHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rec(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rec); f.delete(); ()
      }
      tmpRoots.forEach(p => rec(p.toFile))
    }, "graft-tmp-cleanup"))
  }
  private[graft] def trackedTempDir(prefix: String): java.nio.file.Path = {
    tmpHook
    val p = Files.createTempDirectory(prefix)
    tmpRoots.add(p)
    p
  }

  private val registeredDirs =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Boolean]()

  private[graft] def registerViews(spark: SparkSession, dir: String): Unit =
    // testdata dirs are immutable, so registration is once per (session,
    // dir) — repeated schema reads otherwise add ~0.5 s to every query
    registeredDirs.getOrElseUpdate((spark, dir), {
      // events.ts has shipped as TIMESTAMP(NANOS) parquet — which Spark can
      // only read as a nanos-long (nanosAsLong) — and as TIMESTAMP(MICROS),
      // which surfaces as TIMESTAMP_NTZ. Normalize on the observed type so
      // every testdata generation presents the same TIMESTAMP-typed `ts`
      // (session tz is UTC everywhere, so the NTZ→LTZ cast is value-
      // preserving and DuckDB sees identical micros in the oracle).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tableNames.foreach { n =>
        val raw = spark.read.parquet(s"$dir/$n.parquet")
        val df =
          if (n == "events") raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              // integer division: `/` would be Double arithmetic, and at
              // ~1.7e18 ns doubles only resolve 256 ns — ~1.6% of values
              // would land 1 µs low after the cast truncates
              raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            case org.apache.spark.sql.types.TimestampNTZType =>
              raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
            case _ => raw
          } else raw
        df.createOrReplaceTempView(n)
      }
      true
    })

  private def q(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { registerViews(s, dir); s.sql(sql) }

  // ------------------------------------------------------------------------
  // Shared ANSI SQL — runs verbatim on Spark SQL and DuckDB.
  // ------------------------------------------------------------------------

  /** Q1 — S1/S3 scan + F1 filter + P1 projection. */
  private val Q01 =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q2 — F2 point lookup (`README.md:153` shape). */
  private val Q02 =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderkey = 103 ORDER BY o_orderkey""".stripMargin

  /** Q3 — X1/X2 md5+concat, P3 derived column (`hudi/hudi_scd_script.py:63`). */
  private val Q03 =
    """SELECT c_custkey, md5(concat(c_name, c_mktsegment)) AS checksum
      |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin

  /** Q4 — J1 equi+theta inner join (`hudi/hudi_scd_script.py:94-97` shape). */
  private val Q04 =
    """SELECT c.c_custkey, o.o_orderkey FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal <> o.o_totalprice
      |WHERE c.c_nationkey = 1 ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** Q5 — J2 SQL inner join + residual WHERE. */
  private val Q05 =
    """SELECT n.n_name, s.s_name FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_acctbal > 5000 ORDER BY n.n_name, s.s_name""".stripMargin

  /** Q6 — U1 UNION distinct (`iceberg/iceberg_scd_script.py:62`). */
  private val Q06 =
    """SELECT c_nationkey AS k FROM customer
      |UNION SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin

  /** Q7 — U2 union-by-name shape (UNION ALL with aligned aliases). */
  private val Q07 =
    """SELECT c_custkey AS id, c_acctbal AS bal FROM customer
      |UNION ALL SELECT s_suppkey AS id, s_acctbal AS bal FROM supplier
      |ORDER BY id, bal""".stripMargin

  /** Q8 — W1 LEAD window (`iceberg/iceberg_scd_script.py:65` shape). */
  private val Q08 =
    """SELECT o_custkey, o_orderkey,
      |  LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_ok
      |FROM orders WHERE o_custkey <= 20 ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q9 — E1 CASE over window (`iceberg/iceberg_scd_script.py:70`). */
  private val Q09 =
    """SELECT o_custkey, o_orderkey,
      |  CASE WHEN LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
      |       THEN 1 ELSE 0 END AS iscurrent
      |FROM orders WHERE o_custkey <= 20 ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q10 — E3 CTE pipeline (full Iceberg-script shape,
   *  `iceberg/iceberg_scd_script.py:54-73`); window order made total via
   *  o_orderkey so LEAD is deterministic on both engines. */
  private val Q10 =
    """WITH to_update AS (
      |  SELECT o_custkey AS id, o_orderkey AS ok, o_orderdate AS valid_from
      |  FROM orders WHERE o_custkey <= 10),
      |updated AS (
      |  SELECT id, ok, valid_from,
      |    LEAD(valid_from) OVER (PARTITION BY id ORDER BY valid_from, ok) AS eff_from
      |  FROM to_update)
      |SELECT id, ok, valid_from, COALESCE(eff_from, NULL) AS valid_to,
      |  CASE WHEN eff_from IS NULL THEN 1 ELSE 0 END AS iscurrent
      |FROM updated ORDER BY id, ok""".stripMargin

  /** Q11 — aggregation closure (SURVEY §2.4 gap); sums accumulate in
   *  DECIMAL (exact) then round through DOUBLE so both engines render the
   *  result identically (the driver's hasher renders DECIMAL differently
   *  per engine — the q36 pattern). */
  private val Q11 =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q12 — join + agg + sort/limit closure. */
  private val Q12 =
    """SELECT n.n_name, COUNT(*) AS suppliers FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY suppliers DESC, n.n_name LIMIT 10""".stripMargin

  /** Q13 — semi join (MERGE matched-side shape, SURVEY §2.4). */
  private val Q13 =
    """SELECT c_custkey FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Q14 — anti join (MERGE not-matched-side shape). */
  private val Q14 =
    """SELECT c_custkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Q15 — A1 count action. */
  private val Q15 = "SELECT COUNT(*) AS n FROM lineitem"

  /** Q16 — JSON scalar access (dialect split: Spark `get_json_object`,
   *  DuckDB `json_extract_string`). */
  private val Q16Spark =
    """SELECT event_id, get_json_object(props, '$.k') AS k FROM events
      |WHERE event_id < 100 ORDER BY event_id""".stripMargin
  private val Q16Duck =
    """SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
      |WHERE event_id < 100 ORDER BY event_id""".stripMargin

  /** Q17 — text-table aggregation (documents fixture). */
  private val Q17 =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------------
  // Q18 — end-to-end SCD2 merge through the REAL table layer
  // (SnapshotTable + MergeInto), oracle re-derives the same result in
  // pure SQL (Iceberg-script algorithm, `iceberg/iceberg_scd_script.py:54-82`).
  // Initial snapshot: customers with c_custkey % 3 <> 0; staged batch: all
  // customers, payload changed for c_custkey % 5 = 0. Deterministic load
  // timestamps.
  // ------------------------------------------------------------------------

  private def scd2MergeResult(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val t0 = lit(Timestamp.valueOf("2024-01-01 00:00:00"))
    val t1 = lit(Timestamp.valueOf("2024-02-01 00:00:00"))
    val initial = customer.filter(col("c_custkey") % 3 =!= 0).select(
      col("c_custkey").as("id"),
      md5(concat(col("c_name"), col("c_mktsegment"))).as("checksum"),
      t0.as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"),
      lit(1).as("iscurrent"))
    val stagedSeg = when(col("c_custkey") % 5 === 0, upper(col("c_mktsegment")))
      .otherwise(col("c_mktsegment"))
    val staged = customer.select(
      col("c_custkey").as("id"),
      md5(concat(col("c_name"), stagedSeg)).as("checksum"),
      t1.as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"),
      lit(1).as("iscurrent"))

    val table = warmTable("q18", dir)(SnapshotTable.create(s,
      trackedTempDir("graft_q18").toString, initial))
    val cols = staged.columns.toSeq
    val changed = table.read().alias("t")
      .join(staged.alias("s"),
        col("t.id") === col("s.id") &&
          col("t.checksum") =!= col("s.checksum") &&
          col("t.iscurrent") === 1,
        "inner")
      .select(cols.map(c => col(s"t.$c")): _*)
    val unioned = changed.union(staged.select(cols.map(col): _*)).distinct()
    val w = Window.partitionBy(col("id")).orderBy(col("valid_from"))
    val src = unioned
      .withColumn("eff_from", lead(col("valid_from"), 1).over(w))
      .withColumn("valid_to", col("eff_from"))
      .withColumn("iscurrent", when(col("eff_from").isNull, 1).otherwise(0))
      .drop("eff_from")
    table.merge(src, col("t.id") === col("s.id") && col("t.checksum") === col("s.checksum"))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
    table.read().select(col("id"), col("iscurrent"), col("checksum"))
      .orderBy("id", "iscurrent", "checksum")
  }

  private val Q18Duck =
    """WITH initial AS (
      |  SELECT c_custkey AS id, md5(concat(c_name, c_mktsegment)) AS checksum,
      |         TIMESTAMP '2024-01-01 00:00:00' AS valid_from, 1 AS iscurrent
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |staged AS (
      |  SELECT c_custkey AS id,
      |         md5(concat(c_name, CASE WHEN c_custkey % 5 = 0 THEN upper(c_mktsegment) ELSE c_mktsegment END)) AS checksum,
      |         TIMESTAMP '2024-02-01 00:00:00' AS valid_from, 1 AS iscurrent
      |  FROM customer),
      |changed AS (
      |  SELECT t.id, t.checksum, t.valid_from FROM initial t
      |  JOIN staged s ON t.id = s.id AND t.checksum <> s.checksum AND t.iscurrent = 1),
      |unioned AS (
      |  SELECT id, checksum, valid_from FROM changed
      |  UNION SELECT id, checksum, valid_from FROM staged),
      |win AS (
      |  SELECT id, checksum,
      |         LEAD(valid_from) OVER (PARTITION BY id ORDER BY valid_from) AS eff_from
      |  FROM unioned),
      |src AS (
      |  SELECT id, checksum, CASE WHEN eff_from IS NULL THEN 1 ELSE 0 END AS iscurrent FROM win),
      |merged AS (
      |  SELECT id, iscurrent, checksum FROM src
      |  UNION ALL
      |  SELECT t.id, t.iscurrent, t.checksum FROM initial t
      |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.id = t.id AND s.checksum = t.checksum))
      |SELECT id, iscurrent, checksum FROM merged ORDER BY id, iscurrent, checksum""".stripMargin

  // ------------------------------------------------------------------------
  // Q19 — point lookup over a committed SnapshotTable with stats pruning
  // (the reference's headline query class, BASELINE.md). The table is built
  // once per scale dir (range-partitioned on the key so per-file min/max
  // stats are disjoint); the measured query is the pruned scan.
  // ------------------------------------------------------------------------

  private val snapshotCache = scala.collection.concurrent.TrieMap[String, SnapshotTable]()

  private[graft] def ordersSnapshot(s: SparkSession, dir: String): SnapshotTable =
    snapshotCache.getOrElseUpdate(dir, {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      SnapshotTable.create(s,
        trackedTempDir("graft_orders_snap").toString,
        orders.repartitionByRange(8, col("o_orderkey")))
    })

  /** Warm-built tables for the mutation queries (q18/q41/q42/q43): the
   *  initial snapshot is built ONCE per (query, scale dir) and [[SnapshotTable.restore]]d
   *  to its pristine version before every re-run — a metadata-only commit —
   *  so repeated bench invocations time the merge/upsert/read/scan alone,
   *  not the table build (BASELINE.md's lookup/merge latencies are also
   *  against pre-provisioned tables). Correctness isolation is unchanged:
   *  a verify run invokes each query once per JVM, so its table is always
   *  freshly built, and a restored table is bit-identical to a fresh one
   *  (restore re-references the pristine version's files). */
  private val builtTables =
    scala.collection.concurrent.TrieMap[(String, String), (SnapshotTable, Long)]()

  /** Drop every JVM-level fixture cache. The caches are keyed by scale
   *  dir (not by session) and hand back [[SnapshotTable]] handles bound
   *  to the session they were built under — after a
   *  `SparkSession.stop()` + fresh-session swap (the bench's scale
   *  block) a cached handle launches jobs through the STOPPED session
   *  and throws, or quietly serves suite-warmed state against the
   *  fresh-session intent. Call this after any session swap so tables
   *  rebuild under the live session. */
  private[graft] def resetCaches(): Unit = {
    registeredDirs.clear()
    snapshotCache.clear()
    builtTables.clear()
    ivfIndexCache.clear()
    ivfTableCache.clear()
    ivfSq8TableCache.clear()
    ivfPqTableCache.clear()
    ivfStreamTableCache.clear()
    vacuumCache.clear()
    builtIndexPairs.clear()
    builtMaintIndex.clear()
    streamIndexedCache.clear()
    builtSpanIndex.clear()
    spjBuilt.clear()
  }

  private def warmTable(key: String, dir: String)(build: => SnapshotTable): SnapshotTable = {
    val (t, pristine) = builtTables.getOrElseUpdate((key, dir), {
      val built = build
      (built, built.currentVersion())
    })
    if (t.currentVersion() != pristine) t.restore(pristine)
    t
  }

  /** Q69 — point lookup on a HASH-DISTRIBUTED key (every file's
   *  [min,max] spans the whole key space, so q19's min/max stats pruning
   *  cannot skip anything): the manifest-level bloom index
   *  ([[graft.tables.FileBloom]]) is what prunes here, the Hudi
   *  bloom-index role. Table built once per scale dir with
   *  `graft.bloom.columns`/`graft.bloom.manifest` set BEFORE the data
   *  write so every file carries filters; the measured query is the
   *  bloom-pruned scan. */
  private def bloomLookupQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("bloom_lookup", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val tbl = SnapshotTable.create(s,
        trackedTempDir("graft_bloom_lookup").toString,
        orders.limit(1)) // seed commit carries the properties
        .setProperties(Map(
          "graft.bloom.columns" -> "o_custkey",
          "graft.bloom.manifest" -> "true"))
      tbl.overwrite(orders.repartition(8, col("o_custkey")))
    }
    t.scan(col("o_custkey") === 271)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Q70 — `replaceWhere` (predicate-scoped atomic overwrite, the
   *  idempotent-backfill primitive): re-materialize the 1997+ slice of
   *  the orders table with doubled prices in ONE commit; files outside
   *  the slice carry forward untouched. The ×2 is binary-exact on
   *  doubles, so the oracle replays the replace algebra as a plain
   *  UNION ALL with no rounding hazards. Warm table restored to its
   *  pristine version between reps (the q18 mutation pattern). */
  /** Q94 — idempotent batch ingest ([[graft.tables.SnapshotTable.copyInto]],
   *  Delta's exactly-once COPY INTO surface; the SQL statement form is
   *  MaintenanceSqlSpec-covered): the customer table is staged as
   *  three parquet files across two staging dirs; the query copies
   *  the first dir TWICE (the second run is a recorded no-op — the
   *  loaded-file registry commits atomically with the data) and then the
   *  second dir. The final table must equal the full staged data with NO
   *  duplicates — the oracle is a plain SELECT over customer, and any
   *  double-load doubles counts and fails the hash. Staging dirs are
   *  built once per scale dir and recorded as table properties; each rep
   *  restores the pristine (empty, registry-free) seed so the
   *  three-phase load replays identically. */
  private def copyIntoQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("copy_into", dir) {
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val stage1 = trackedTempDir("graft_copy_stage1").toString
      val stage2 = trackedTempDir("graft_copy_stage2").toString
      cust.filter(col("c_custkey") % 3 === 0).coalesce(1)
        .write.mode("append").parquet(stage1)
      cust.filter(col("c_custkey") % 3 === 1).coalesce(1)
        .write.mode("append").parquet(stage1)
      cust.filter(col("c_custkey") % 3 === 2).coalesce(1)
        .write.mode("append").parquet(stage2)
      SnapshotTable.create(s,
        trackedTempDir("graft_copyinto").toString,
        cust.filter(col("c_custkey") < 0)) // empty seed, right schema
        .setProperties(Map("graft.q94.stage1" -> stage1, "graft.q94.stage2" -> stage2))
    }
    val stage1 = t.properties()("graft.q94.stage1")
    val stage2 = t.properties()("graft.q94.stage2")
    t.copyInto(stage1)
    val noop = t.copyInto(stage1) // recorded no-op: registry committed with the data
    require(noop == ((0, 0L)), s"COPY INTO re-run was not a no-op: $noop")
    t.copyInto(stage2)
    t.read().select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }
  private val Q94Duck =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |ORDER BY c_custkey""".stripMargin

  private def replaceWhereQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("replace_where", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      SnapshotTable.create(s,
        trackedTempDir("graft_replace").toString,
        orders.repartitionByRange(8, col("o_orderdate")))
    }
    val pred = col("o_orderdate") >= lit(java.sql.Date.valueOf("1997-01-01"))
    val replacement = t.read().filter(pred)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.overwriteWhere(pred, replacement)
    t.read().select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Q77 — branch write-audit-publish (the Iceberg refs/WAP cycle the
   *  reference gets from its Iceberg runtime jars): fork an `audit`
   *  branch off the warm orders table, run the doubled-price backfill as
   *  a branch-isolated UPDATE, audit row conservation on the branch, and
   *  FAST FORWARD the audited manifest back to main as one CAS squash
   *  commit. The value columns replay in DuckDB exactly like q70 (×2 is
   *  binary-exact on doubles); the structural booleans capture what the
   *  replay cannot see — main never moved between fork and publish, the
   *  publish landed as exactly one version, and its action row records
   *  the branch lineage. */
  private def branchWapQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("branch_wap", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      SnapshotTable.create(s,
        trackedTempDir("graft_wap").toString,
        orders.repartitionByRange(8, col("o_orderdate")))
    }
    if (t.listBranches().contains("audit")) t.dropBranch("audit")
    val b = t.createBranch("audit")
    val forkBase = b.history().map(_.version).min
    val pred = col("o_orderdate") >= lit(java.sql.Date.valueOf("1997-01-01"))
    b.update(pred, Map("o_totalprice" -> (col("o_totalprice") * 2)))
    // AUDIT step, on the branch only: the backfill must conserve rows
    val preTotal = t.read().count()
    val auditOk = b.read().count() == preTotal
    val mainHeadPre = t.currentVersion()
    t.fastForward("audit")
    val publishedSquash = t.currentVersion() == mainHeadPre + 1 &&
      t.history().head.action.startsWith("publish-branch:audit@")
    t.read().select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("audit_rows_match", lit(auditOk))
      .withColumn("main_isolated_pre_publish", lit(mainHeadPre == forkBase))
      .withColumn("published_squash", lit(publishedSquash))
      .orderBy("o_orderkey")
  }

  /** Q78 — streaming source→sink round trip (§2.6's Delta-streaming role
   *  as a gated query, not just a spec): the events click-slice is
   *  committed to a snapshot table in THREE versions, `readStream
   *  .format("graft-table")` replays them as version micro-batches
   *  (`maxVersionsPerTrigger=1` backfill pacing), a stateless transform
   *  runs in-stream, and [[graft.streaming.StreamIngest.appendSink]]
   *  lands each batch as one atomic idempotent commit. Deterministic by
   *  construction — stateless transforms make the result independent of
   *  batch boundaries, and the boundaries themselves are pinned by the
   *  paced version replay (the `paced_batches` structural column
   *  asserts one `stream-*` commit per source version reached the sink
   *  log). */
  private def streamRoundtripQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ev = s.table("events")
    val src = warmTable("stream_src", dir) {
      val base = SnapshotTable.create(s,
        trackedTempDir("graft_stream_src").toString,
        ev.filter(col("event_id") % 3 === 0))
      base.append(ev.filter(col("event_id") % 3 === 1))
      base.append(ev.filter(col("event_id") % 3 === 2))
      base
    }
    val out = SnapshotTable.createEmpty(s,
      trackedTempDir("graft_stream_out").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value2",
          org.apache.spark.sql.types.DoubleType))))
    // one checkpoint across the runs: each paced run resumes exactly
    // where the previous stopped (the V1 recovery contract) and covers
    // ONE more source version — three runs replay the three commits as
    // three micro-batches
    val ckpt = trackedTempDir("graft_stream_ckpt").toString
    (1 to 3).foreach { _ =>
      val stream = s.readStream.format("graft-table")
        .option("path", src.root)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), (col("value") * 2).as("value2"))
      graft.streaming.StreamIngest.runOnce(
        graft.streaming.StreamIngest.appendSink(stream, out), ckpt)
    }
    val pacedBatches =
      out.history().count(_.action.startsWith("stream-")) == 3
    out.read().select(col("event_id"), col("user_id"), col("value2"))
      .withColumn("paced_batches", lit(pacedBatches))
      .orderBy("event_id")
  }

  /** Q81 — streaming WATERMARKED windowed aggregation as a gated query
   *  (§2.6's streaming-rollup role): daily event counts per type via
   *  [[graft.streaming.StreamIngest.windowedCounts]] (event-time
   *  tumbling windows, 1-hour watermark, append-mode emission of
   *  finalized windows only). Deterministic despite watermark
   *  semantics: the first run drains every committed version (all real
   *  data plus a data-derived far-future sentinel) in ONE batch, so no
   *  row is ever late relative to a mid-stream watermark, and the
   *  sentinel leaves the final watermark past every real window; the
   *  resumed second run begins with the drained source's FLUSH batch
   *  ([[graft.streaming.GraftTableSource]] finalization), in which every
   *  watermark-closed window emits. The oracle is then a plain GROUP BY.
   *  Counts only — a streamed double sum's addition order is not an
   *  oracle-stable quantity. */
  private def streamWindowQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ev = s.table("events").select(col("ts"), col("event_type"))
    val src = warmTable("stream_win_src", dir) {
      def slice(from: String, until: String) =
        ev.filter(col("ts") >= lit(java.sql.Timestamp.valueOf(from)) &&
          col("ts") < lit(java.sql.Timestamp.valueOf(until)))
      val base = SnapshotTable.create(s,
        trackedTempDir("graft_stream_win").toString,
        slice("2000-01-01 00:00:00", "2024-01-11 00:00:00"))
      base.append(slice("2024-01-11 00:00:00", "2024-01-21 00:00:00"))
      base.append(slice("2024-01-21 00:00:00", "2100-01-01 00:00:00"))
      base
    }
    // ONE sentinel commit rides along with the real data and pushes the
    // watermark past every real window: its timestamp is DERIVED from the
    // observed max event ts (+ window + watermark + margin), so a
    // testdata regeneration with a longer event range cannot silently
    // leave late windows unemitted. The windows then EMIT in the second
    // run's finalization batch — the source offers one empty flush batch
    // once the offset log shows every version drained
    // ([[graft.streaming.GraftTableSource]] odd offsets), which replaced
    // the old second-sentinel commit. Appended per invocation — a
    // restored warm table re-accumulates sentinels, which is harmless:
    // sentinel rows are filtered and re-delivered duplicates cannot move
    // the watermark.
    def sentinel(): Unit = {
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val ts = new java.sql.Timestamp(
        maxTs.getTime + (24L + 1L + 1L) * 3600L * 1000L) // window + watermark + margin
      src.append(s.createDataFrame(
        Seq((ts, "__sentinel"))).toDF("ts", "event_type"))
      ()
    }
    val out = SnapshotTable.createEmpty(s,
      trackedTempDir("graft_stream_win_out").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("window_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    val ckpt = trackedTempDir("graft_stream_win_ckpt").toString
    def run(): Unit = {
      val stream = graft.streaming.StreamIngest.windowedCounts(
        s.readStream.format("graft-table")
          .option("path", src.root)
          .load()
          .withColumn("value", lit(0.0)),
        tsCol = "ts", keyCol = "event_type", window = "1 day", watermark = "1 hour")
        .select(col("window_start"), col("event_type"), col("n"))
      graft.streaming.StreamIngest.runOnce(
        graft.streaming.StreamIngest.appendSink(stream, out), ckpt)
    }
    // Streaming aggregation instantiates ONE state store per shuffle
    // partition per lifecycle; the aggregate here holds a few dozen
    // (window, type) groups, so 32 partitions is 32x the store
    // open/commit/checkpoint overhead for no parallelism. Scope the
    // partition count down around the two runs (state partitioning is
    // recorded in the checkpoint, so both runs must agree).
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      sentinel()
      run() // drains all committed versions in one batch; emits nothing yet
      run() // the drained source's flush batch emits every closed window
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    out.read().filter(col("event_type") =!= "__sentinel")
      .orderBy("window_start", "event_type")
  }

  /** Q114 — streaming EXACT dedup ingest
   *  ([[graft.streaming.StreamIngest.dedupExactSink]],
   *  `dropDuplicatesWithinWatermark` + the atomic idempotent sink): the
   *  at-least-once upstream shape — the source table re-delivers every
   *  5th and every 7th click as later commits, the stream drops the
   *  re-deliveries by event_id with watermark-BOUNDED state (plain
   *  dropDuplicates' grow-forever state is the 100 TB trap), and the
   *  survivors land append-only. The oracle is the plain distinct click
   *  set: a duplicate surviving (broken state), a survivor lost (over-
   *  aggressive lateness), or a double-committed batch (broken sink
   *  idempotence) all shift the row set and fail the hash. */
  private def streamDedupQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val clicks = s.table("events").filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val src = warmTable("stream_dedup_src", dir) {
      val base = SnapshotTable.create(s,
        trackedTempDir("graft_stream_dedup").toString, clicks)
      base.append(clicks.filter(col("event_id") % 5 === 0)) // redelivery 1
      base.append(clicks.filter(col("event_id") % 7 === 0)) // redelivery 2
      base
    }
    val out = SnapshotTable.createEmpty(s,
      trackedTempDir("graft_stream_dedup_out").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        // the watermark column must survive through the dedup operator,
        // so it lands in the sink too; the declared output drops it
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
    val ckpt = trackedTempDir("graft_stream_dedup_ckpt").toString
    // dedup state stores scale with shuffle partitions — scope down to
    // the stream's real width (the q81 discipline)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val stream = s.readStream.format("graft-table")
        .option("path", src.root)
        .load()
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.streaming.StreamIngest.runOnce(
        graft.streaming.StreamIngest.dedupExactSink(stream, out,
          keyCols = Seq("event_id"), tsCol = "ts", watermark = "1 hour"), ckpt)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    out.read().select(col("event_id"), col("user_id")).orderBy("event_id")
  }
  private val Q114Duck =
    """SELECT event_id, user_id FROM events
      |WHERE event_type = 'click' ORDER BY event_id""".stripMargin

  /** Q85 — deletion-vector DELETE ([[graft.tables.SnapshotTable]]
   *  `graft.dv.enabled`, Delta DV / Iceberg positional-delete parity):
   *  two stacked deletes land as O(deleted rows) parquet sidecars — zero
   *  base files rewritten (DeletionVectorSpec pins the byte accounting) —
   *  and the read anti-joins the positions away through a broadcast
   *  join. The oracle replays both predicates over the raw table. */
  private def dvOrdersTable(s: SparkSession, dir: String): SnapshotTable =
    warmTable("q85", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val t = SnapshotTable.create(s,
        trackedTempDir("graft_q85").toString,
        orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice")).repartition(8))
      t.setProperties(Map("graft.dv.enabled" -> "true"))
      t
    }

  private def dvDeleteQuery(s: SparkSession, dir: String): DataFrame = {
    val table = dvOrdersTable(s, dir)
    table.delete(col("o_orderkey") % 97 === 0)
    table.delete(col("o_custkey") % 89 === 0) // stacked second sidecar
    table.read()
      .filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  private val Q85Duck =
    """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_orderkey % 97 <> 0 AND o_custkey % 89 <> 0 AND o_orderkey < 5000
      |ORDER BY o_orderkey""".stripMargin

  /** Q86 — deletion-vector UPDATE (Delta's DV update model): matched
   *  rows' old positions land in a sidecar, the reassigned rows append
   *  as new files — bytes written scale with matched rows, not touched
   *  files (DeletionVectorSpec pins the accounting). The oracle replays
   *  the assignment as a CASE over the raw table. */
  private def dvUpdateQuery(s: SparkSession, dir: String): DataFrame = {
    val table = dvOrdersTable(s, dir)
    table.update(col("o_orderkey") % 101 === 0,
      Map("o_orderstatus" -> lit("U"), "o_totalprice" -> (col("o_totalprice") * 2)))
    table.read()
      .filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderkey")
  }

  private val Q86Duck =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 101 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
      |  round(CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice * 2
      |             ELSE o_totalprice END, 2) AS price
      |FROM orders WHERE o_orderkey < 5000
      |ORDER BY o_orderkey""".stripMargin

  private def snapshotPointLookup(s: SparkSession, dir: String): DataFrame =
    ordersSnapshot(s, dir)
      .scan(col("o_orderkey") === 103)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  // ------------------------------------------------------------------------
  // Q20+ — LLM-data-pipeline operators (graft.ext): dedup, similarity
  // search, text analysis, multimodal plumbing. Spark side runs the
  // library operators; oracles re-derive the result in DuckDB SQL where
  // expressible (minhash/LSH rely on the fixture's planted near-dup pairs
  // being cleanly separated from the background, so the exact-jaccard
  // pair list doubles as their oracle).
  // ------------------------------------------------------------------------

  private def exactDedupQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    ext.Dedup.exact(s.table("events"), Seq("user_id", "event_type"), "event_id")
      .orderBy("user_id", "event_type")
  }
  private val Q20Duck =
    """SELECT user_id, event_type, MIN(event_id) AS keep_event_id, COUNT(*) AS copies
      |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin

  private def jaccardQuery(s: SparkSession, dir: String): DataFrame =
    ext.Dedup.jaccardPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3, minSim = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  /** DuckDB-dialect shingle inverted-index jaccard (same algorithm). */
  private val Q21Duck =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                for i in range(1, len(t)-1)]) AS shingles
      |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
      |ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |         any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b, round(inter*1.0/(na+nb-inter), 6) AS jaccard FROM pairs
      |WHERE inter*1.0/(na+nb-inter) >= 0.8 ORDER BY id_a, id_b""".stripMargin

  private def cosineTopKQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    ext.Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "n_id")
  }
  private val Q22Duck =
    """WITH scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
      |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      |  WHERE a.vec_id < 10),
      |ranked AS (
      |  SELECT q_id, n_id, c,
      |         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
      |  FROM scored)
      |SELECT q_id, n_id, round(c, 4) AS cos FROM ranked WHERE rnk <= 5
      |ORDER BY q_id, n_id""".stripMargin

  /** Q97 — hard-negative mining ([[ext.Similarity.hardNegatives]], the
   *  DPR contrastive-training data-prep step): for ten (query, positive)
   *  pairs — positive planted as vec_id + 10 — the top-3 most similar
   *  corpus vectors excluding the query AND its positive, exclusion
   *  applied before ranking so a positive can never displace a real
   *  negative. The oracle replays scoring, exclusion, and the
   *  (cos desc, n_id) ranking exactly, q22-style. */
  private def hardNegativesQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val pairs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), (col("vec_id") + 10).as("pos_id"))
    ext.Similarity.hardNegatives(emb, pairs, "vec_id", "embedding", k = 3)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "n_id")
  }
  private val Q97Duck =
    """WITH scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
      |  FROM embeddings a JOIN embeddings b
      |    ON b.vec_id <> a.vec_id AND b.vec_id <> a.vec_id + 10
      |  WHERE a.vec_id < 10),
      |ranked AS (
      |  SELECT q_id, n_id, c,
      |         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
      |  FROM scored)
      |SELECT q_id, n_id, round(c, 4) AS cos FROM ranked WHERE rnk <= 3
      |ORDER BY q_id, n_id""".stripMargin

  /** Q98 — SEMANTIC decontamination
   *  ([[ext.Decontaminate.semanticContaminatedIdsAuto]]): flag corpus
   *  vectors within 0.95 cosine of any "benchmark" vector (every 50th
   *  id) — the paraphrase-leakage pass n-gram overlap (q54) cannot see,
   *  stacked the way DataComp/FineWeb pipelines run both. Benchmark
   *  embeddings broadcast; the corpus never shuffles. The corpus is
   *  doubled with ×2-SCALED copies of the benchmark vectors under
   *  shifted ids (float doubling is exact in both engines, and cosine
   *  ignores scale — so the copies prove DIRECTIONAL matching, not
   *  byte equality), while the raw table's max pairwise cosine is 0.51:
   *  the 0.95 threshold sits in a wide margin on both sides and the
   *  double-accumulated cosine replays exactly. The declared query goes
   *  through the auto regime dispatch (the production entry point); the
   *  fixture's benchmark is far below the broadcast cutover, so it runs
   *  the exact broadcast kernel — the bucketed regime is spec-proven to
   *  flag the identical id set on this fixture (ExtSpec). */
  private def semanticDecontamQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bench = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.unionByName(bench.select(
      (col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    ext.Decontaminate.semanticContaminatedIdsAuto(
        corpus, "vec_id", "embedding", bench, "embedding", minCos = 0.95)
      .orderBy("vec_id")
  }
  private val Q98Duck =
    """WITH bench AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
      |corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000, list_transform(embedding, x -> x * 2) FROM bench)
      |SELECT DISTINCT a.vec_id FROM corpus a JOIN bench b
      |  ON list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95
      |ORDER BY a.vec_id""".stripMargin

  /** Q99 — the FLAGSHIP pipeline composition: quality gate → exact
   *  dedup → n-gram decontamination → per-source token-budget selection,
   *  chained exactly as a training-data build runs them (each stage is
   *  an already-proven operator: q23's counting kernel, q20's dedup,
   *  q54's decontaminate, q80's budget sampler). The oracle replays the
   *  WHOLE chain as one CTE pipeline, so a row leaking past any stage —
   *  a duplicate surviving, a contaminated doc slipping through, a
   *  budget overrun — shifts the final selection and fails the hash.
   *  Every stage keeps its scale shape: predicate pushdown on the gate,
   *  hash-agg dedup, broadcast-semi decontamination (corpus never
   *  shuffles), histogram two-phase budget selection. */
  private def pipelineQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val kept = docs.filter(ext.TextAnalysis.tokenCount(col("text")) >= 30)
    val survivors = ext.Dedup.exact(kept, Seq("text"), "doc_id")
      .select(col("keep_doc_id").as("doc_id"))
    val deduped = kept.join(survivors, "doc_id")
    val bench = docs.filter(col("doc_id") % 20 === 3).select(col("text"))
    val contam = ext.Decontaminate.contaminatedIds(
      deduped, "doc_id", "text", bench, "text", n = 5)
    val clean = deduped.join(contam, Seq("doc_id"), "left_anti")
    val scored = clean.select(col("doc_id"), col("source"),
      ext.TextAnalysis.qualityScore(col("text")).as("quality"),
      ext.TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
    ext.Sampling.budgetPerGroup(scored, "source", "quality", "tokens", "doc_id",
        budget = 400L)
      .orderBy("doc_id")
  }
  private val Q99Duck =
    """WITH kept AS (
      |  SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 30),
      |ded AS (
      |  SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY text) AS keeper
      |                 FROM kept) WHERE doc_id = keeper),
      |sh AS (
      |  SELECT doc_id, unnest([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
      |                         for i in range(1, len(t)-3)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ded)),
      |bsh AS (
      |  SELECT DISTINCT unnest([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
      |                          for i in range(1, len(t)-3)]) AS s
      |  FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 20 = 3)),
      |contam AS (SELECT DISTINCT doc_id FROM sh JOIN bsh USING (s)),
      |clean AS (SELECT * FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      |scored AS (
      |  SELECT doc_id, source,
      |    round((len(list_distinct(string_split(text,' ')))*1.0 / len(string_split(text,' ')))
      |      * (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1.0
      |              ELSE len(string_split(text,' '))/10.0 END)
      |      * (CASE WHEN length(replace(text,' ',''))*1.0/len(string_split(text,' '))
      |                   BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS tokens
      |  FROM clean),
      |ranked AS (
      |  SELECT *, sum(tokens) OVER (PARTITION BY source
      |    ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM scored)
      |SELECT doc_id, source, quality, tokens FROM ranked WHERE cum <= 400
      |ORDER BY doc_id""".stripMargin

  private def textStatsQuery(s: SparkSession, dir: String): DataFrame = {
    import ext.TextAnalysis._
    val t = col("text")
    s.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"),
      tokenCount(t).cast("long").as("n_tokens"),
      distinctTokenCount(t).cast("long").as("n_distinct_tokens"),
      round(avgTokenLength(t), 6).as("avg_token_len"),
      length(t).cast("long").as("n_chars_calc"))
      .orderBy("doc_id")
  }
  private val Q23Duck =
    """SELECT doc_id,
      |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct_tokens,
      |  round(length(replace(text,' ',''))*1.0 / len(string_split(text,' ')), 6) AS avg_token_len,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q46 — document quality scoring (length/distinct/avg-token-length
   *  heuristics), the standard pre-training filter family; formula
   *  replayed verbatim in the oracle. */
  private def qualityQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), ext.TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  private val Q46Duck =
    """SELECT doc_id, round(
      |  (len(list_distinct(string_split(text,' ')))*1.0 / len(string_split(text,' ')))
      |  * (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1.0
      |          ELSE len(string_split(text,' '))/10.0 END)
      |  * (CASE WHEN length(replace(text,' ',''))*1.0/len(string_split(text,' '))
      |               BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q88's exported linear model: token → weight. English markers vote
   *  keep, other-language markers vote drop; one token absent from every
   *  fixture document exercises the miss path. Weights are dyadic
   *  rationals (k/16) so every partial sum is exactly representable —
   *  the score is order-independent and bit-identical across engines
   *  (the [[ext.TextAnalysis.linearScore]] determinism contract). */
  private val Q88Model: Seq[(String, Double)] = Seq(
    "the" -> 0.5, "and" -> 0.375, "of" -> 0.25, "to" -> 0.25, "is" -> 0.125,
    "der" -> -0.5, "die" -> -0.375, "und" -> -0.25, "ist" -> -0.125,
    "el" -> -0.25, "la" -> -0.25, "le" -> -0.375, "les" -> -0.25,
    "zz_never_seen" -> 4.0)
  private val Q88Bias = -0.0625

  /** Q88 — model-based quality classification: an exported LINEAR text
   *  classifier (the fastText / CCNet "wiki-like page" filter role)
   *  applied map-side via [[ext.TextAnalysis.linearScore]] — the
   *  vocabulary ships inside the codegen'd expression as sorted
   *  hash/weight arrays, so scoring is one pass per document with no
   *  token explode, no model join, and no shuffle at any corpus size.
   *  The oracle replays the same inference the expensive way: token
   *  explode + model-table join + group-by — proving the O(log V)
   *  binary-search kernel computes exactly the textbook formula. */
  private def linearScoreQuery(s: SparkSession, dir: String): DataFrame = {
    val sc = ext.TextAnalysis.linearScore(col("text"), Q88Model.toMap, bias = Q88Bias)
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), round(sc, 6).as("lscore"), (sc > lit(0.0d)).as("keep"))
      .orderBy("doc_id")
  }
  private val Q88Duck = {
    val vals = Q88Model.map { case (t, w) => s"('$t', CAST($w AS DOUBLE))" }.mkString(", ")
    s"""WITH model AS (SELECT * FROM (VALUES $vals) m(tok, w)),
       |t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |e AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS tok FROM t),
       |a AS (SELECT e.doc_id, any_value(e.n) AS n, coalesce(sum(m.w), 0.0) AS ws
       |      FROM e LEFT JOIN model m USING (tok) GROUP BY e.doc_id)
       |SELECT doc_id, round(CAST($Q88Bias AS DOUBLE) + ws / n, 6) AS lscore,
       |       (CAST($Q88Bias AS DOUBLE) + ws / n) > 0.0 AS keep
       |FROM a ORDER BY doc_id""".stripMargin
  }

  /** Q80 — token-budget corpus selection ([[ext.Sampling.budgetPerGroup]]):
   *  per source, the best-quality documents whose cumulative token count
   *  fits a 700-token budget — greedy strict-prefix semantics, so the
   *  oracle is ONE window cumsum. The engine runs the histogram
   *  two-phase (bucket classification + boundary-bucket-only ranking, the
   *  q56 skew lesson applied to prefix sums); the oracle's single window
   *  proves the decomposition exact. */
  private def budgetSampleQuery(s: SparkSession, dir: String): DataFrame = {
    val scored = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        ext.TextAnalysis.qualityScore(col("text")).as("quality"),
        ext.TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
    ext.Sampling.budgetPerGroup(scored, "source", "quality", "tokens", "doc_id",
        budget = 700L)
      .orderBy("doc_id")
  }
  private val Q80Duck =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    round((len(list_distinct(string_split(text,' ')))*1.0 / len(string_split(text,' ')))
      |      * (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1.0
      |              ELSE len(string_split(text,' '))/10.0 END)
      |      * (CASE WHEN length(replace(text,' ',''))*1.0/len(string_split(text,' '))
      |                   BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |ranked AS (
      |  SELECT *, sum(tokens) OVER (PARTITION BY source
      |    ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM scored)
      |SELECT doc_id, source, quality, tokens FROM ranked WHERE cum <= 700
      |ORDER BY doc_id""".stripMargin

  /** Q47 — punctuation/stopword density ratios (the remaining members of
   *  the quality-heuristic family), formulas replayed in the oracle. */
  private def textRatiosQuery(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        ext.TextAnalysis.punctRatio(t).as("punct_ratio"),
        ext.TextAnalysis.stopwordRatio(t).as("stopword_ratio"))
      .orderBy("doc_id")
  }
  private val Q47Duck = {
    val stops = ext.TextAnalysis.langMarkers.head._2
      .map("'" + _ + "'").mkString("[", ",", "]")
    s"""SELECT doc_id,
       |  round(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))*1.0
       |        / length(text), 6) AS punct_ratio,
       |  round(len(list_filter(string_split(text,' '), x -> list_contains($stops, x)))*1.0
       |        / len(string_split(text,' ')), 6) AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private def langIdQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), ext.TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  private val Q24Duck = {
    val scores = ext.TextAnalysis.langMarkers.map { case (l, ms) =>
      s"len(list_intersect(list_distinct(string_split(text,' ')), [${ms.map("'" + _ + "'").mkString(",")}])) AS s_$l"
    }.mkString(",\n  ")
    val langs = ext.TextAnalysis.langMarkers.map(_._1)
    val g = langs.map("s_" + _).mkString("greatest(", ",", ")")
    val cases = langs.map(l => s"WHEN s_$l = $g THEN '$l'").mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |  $scores
       |  FROM documents)
       |SELECT doc_id, CASE WHEN $g = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  private def minhashQuery(s: SparkSession, dir: String): DataFrame =
    ext.Dedup.minhashPairs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", minEst = 0.5)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  /** Oracle = exact-jaccard pair list: the fixture's planted near-dups sit
   *  at j≈0.99 vs background ≤0.2, so 64-hash MinHash at est ≥ 0.5
   *  recovers exactly the j ≥ 0.8 set (error prob < 1e-12 per pair). */
  private val Q25Duck =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                for i in range(1, len(t)-1)]) AS shingles
      |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
      |ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |         any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT id_a, id_b FROM pairs WHERE inter*1.0/(na+nb-inter) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** Q26 — SimHash pigeonhole near-dup, structurally oracled (the q49
   *  planted-ground-truth technique inlined): an id-shifted copy of every
   *  document is planted, so each base doc's copy MUST surface as a
   *  verified pair (identical text → identical simhash → Hamming 0); and
   *  because a (chunks−maxHamming)-subset decomposition is COMPLETE for
   *  Hamming ≤ maxHamming, the verified partner set under chunks=4 must
   *  equal the one under chunks=8. Both facts are SF-invariant booleans
   *  DuckDB replays; raw pair values stay covered by ExtSpec. */
  /** Planted-copy id shift for the structural oracles (q26/q28/q29/q48/
   *  q49): copies live at `id + PlantShift`. Construction sites shift
   *  through [[shiftedId]], whose guard raises — riding the existing
   *  scan, no extra action — if a real id ever reaches the shifted
   *  range: a silent planted/real id collision would corrupt every
   *  structural check built on the shift. */
  private val PlantShift: Long = 1000L * 1000L
  private def shiftedId(id: Column): Column =
    when(id >= 0L && id < PlantShift, id + lit(PlantShift))
      .otherwise(raise_error(format_string(
        s"planted-copy id shift collides: id %s outside [0, $PlantShift)", id)))

  private def simhashQuery(s: SparkSession, dir: String): DataFrame = {
    // deterministic 1-in-2 sample (q49 precedent): the checks are
    // per-planted-duplicate, so half the corpus gives the same
    // regression power at a fraction of the doubled-corpus mining cost;
    // the oracle replays the same predicate
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val doubled = docs.unionByName(
      docs.select(shiftedId(col("doc_id")).as("doc_id"), col("text")))
    // each pair list feeds three consumers (planted check, partner set,
    // consistency join) — pin so the pigeonhole mining runs once, not 3x.
    // localCheckpoint is EAGER (mining runs at build time); the pinned
    // blocks are pair-list-sized (two long columns) and live until
    // GC-driven cleanup, an accepted cost for a structural-oracle query.
    // The q49 harness discipline applies here too: the signature pass
    // (tokenize + simhash, the dominant corpus scan) runs ONCE and both
    // band decompositions re-band the pinned signatures — concurrently,
    // since the two minings are independent jobs.
    val sigs = doubled.filter(col("text").isNotNull)
      .select(col("doc_id"),
        ext.functions.simhash64(ext.TextAnalysis.tokens(col("text"))).as("sh"))
      .localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    def mine(chunks: Int) = Future {
      ext.Dedup.simhashPairsFromSignatures(sigs, "doc_id", "sh",
          maxHamming = 3, chunks = chunks)
        .select(col("id_a"), col("id_b")).localCheckpoint()
    }
    val (sim4F, sim8F) = (mine(4), mine(8))
    val sim4 = Await.result(sim4F, Duration.Inf)
    val sim8 = Await.result(sim8F, Duration.Inf)
    ext.Dedup.release(sigs)
    def partners(p: DataFrame) =
      p.select(col("id_a").as("d"), col("id_b").as("p"))
        .unionByName(p.select(col("id_b").as("d"), col("id_a").as("p")))
    // per doubled-doc: every partner present under BOTH decompositions
    val cons = partners(sim4).withColumn("in4", lit(1))
      .join(partners(sim8).withColumn("in8", lit(1)), Seq("d", "p"), "full_outer")
      .groupBy("d")
      .agg(min(when(col("in4").isNotNull && col("in8").isNotNull, 1).otherwise(0)).as("c"))
    // fold a doc's and its planted copy's consistency onto the base id
    val consBase = cons
      .withColumn("doc_id",
        when(col("d") >= PlantShift, col("d") - PlantShift).otherwise(col("d")))
      .groupBy("doc_id").agg(min("c").as("c"))
    val found4 = sim4.filter(col("id_b") === col("id_a") + PlantShift)
      .select(col("id_a").as("doc_id")).withColumn("f4", lit(1))
    val found8 = sim8.filter(col("id_b") === col("id_a") + PlantShift)
      .select(col("id_a").as("doc_id")).withColumn("f8", lit(1))
    docs.select(col("doc_id"))
      .join(found4, Seq("doc_id"), "left")
      .join(found8, Seq("doc_id"), "left")
      .join(consBase, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("f4").isNotNull && col("f8").isNotNull).as("planted_found"),
        coalesce(col("c") === 1, lit(true)).as("partners_consistent"))
      .orderBy("doc_id")
  }
  private val Q26Duck =
    """SELECT doc_id, true AS planted_found, true AS partners_consistent
      |FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""".stripMargin

  /** Q27 — REAL image decode with planted ground truth: per doc_id a
   *  solid-gray PNG is synthesized executor-side (pure-JDK encoder) with
   *  dimensions and gray level derived from the id, then decoded through
   *  `javax.imageio` ([[graft.ext.Multimodal.decodeImage]]). The oracle
   *  replays width/height/channels from the generating arithmetic, and
   *  `lum_bin` — the argmax bin of the luminance histogram computed from
   *  DECODED PIXELS — proves the codec read the image content, not just
   *  the header. */
  private def multimodalQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread the synth+decode over the cluster: the id frame reads as a
    // handful of file splits, and per-row codec work (opaque to Spark's
    // split sizing) would otherwise run at file parallelism — shuffling
    // 8-byte ids is noise next to the decode it parallelizes
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    val assets = ids.mapPartitions { it =>
      it.map { id =>
        val w = 1 + (id % 16).toInt
        val h = 1 + ((id * 3) % 16).toInt
        (id, ext.Multimodal.encodePng(w, h, (id % 256).toInt))
      }
    }.toDF("asset_id", "media")
    ext.Multimodal.decodeImages(assets)
      .select(col("asset_id"), col("width"), col("height"), col("channels"),
        (array_position(col("features"), array_max(col("features"))) - 1)
          .cast("int").as("lum_bin"))
      .orderBy("asset_id")
  }
  private val Q27Duck =
    """SELECT doc_id AS asset_id,
      |  CAST(1 + doc_id % 16 AS INT) AS width,
      |  CAST(1 + (doc_id * 3) % 16 AS INT) AS height,
      |  3 AS channels,
      |  CAST((doc_id % 256) // 32 AS INT) AS lum_bin
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Q93 — REAL multi-frame video decode ([[ext.Multimodal.decodeVideos]],
   *  the JDK GIF codec — encoder AND decoder sides): each document plants
   *  an animated GIF (frame count, dims, and per-frame gray derived from
   *  doc_id; one-entry indexed palettes so grays survive exactly),
   *  round-trips it through `writeToSequence` → batched `mapPartitions`
   *  decode at stride 2 — skipped frames never pixel-decode, the point
   *  of stride sampling at scale — and emits per-sampled-frame dominant
   *  luminance bins the oracle replays as pure arithmetic. */
  private def videoDecodeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long] // q27 note
    val assets = ids.mapPartitions { it =>
      it.map { id =>
        val w = 1 + (id % 8).toInt
        val h = 1 + ((id * 5) % 8).toInt
        val nf = 2 + (id % 5).toInt
        val grays = (0 until nf).map(f => ((id * 31 + f * 40) % 256).toInt)
        (id, ext.Multimodal.encodeGif(w, h, grays))
      }
    }.toDF("asset_id", "media")
    // sampled_bins scalarized to a CSV string: the driver's row-hash
    // comparator sorts/hashes column VALUES, and a list column is
    // unhashable on the pandas side — the decode itself still runs on
    // the full array (ExtSpec pins the array form)
    ext.Multimodal.decodeVideos(assets, everyN = 2)
      .withColumn("sampled_bins",
        array_join(col("sampled_bins").cast("array<string>"), ","))
      .orderBy("asset_id")
  }
  private val Q93Duck =
    """SELECT doc_id AS asset_id,
      |  CAST(1 + doc_id % 8 AS INT) AS width,
      |  CAST(1 + (doc_id * 5) % 8 AS INT) AS height,
      |  CAST(2 + doc_id % 5 AS INT) AS n_frames,
      |  array_to_string([CAST(((doc_id * 31 + f * 40) % 256) // 32 AS INT)
      |   for f in range(0, 2 + doc_id % 5, 2)], ',') AS sampled_bins
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Q89 — REAL audio decode ([[ext.Multimodal.decodeAudios]], the JDK's
   *  `javax.sound.sampled` WAV codec — encoder AND decoder sides): each
   *  document plants a deterministic 16-bit PCM square wave (amplitude,
   *  half-period, and length derived from doc_id), round-trips it through
   *  `AudioSystem.write` → batched `mapPartitions` decode, and extracts
   *  container metadata plus signal features from the DECODED frames. A
   *  ±a square wave makes every feature exactly replayable: RMS = a
   *  (n·a² and a² are exact doubles, sqrt is correctly rounded), zero
   *  crossings = ⌊(n−1)/half⌋, peak = a — so the oracle is pure
   *  arithmetic, yet only passes if the codec round-trip preserved every
   *  frame. */
  private def audioDecodeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .repartition(s.sparkContext.defaultParallelism).as[Long] // q27 note
    val assets = ids.mapPartitions { it =>
      it.map { id =>
        val a = (128 + (id % 50) * 16).toInt
        val half = (1 + id % 7).toInt
        val n = (400 + (id % 100) * 8).toInt
        val samples = Array.tabulate(n) { t =>
          (if ((t / half) % 2 == 0) a else -a).toShort
        }
        (id, ext.Multimodal.encodeWav(8000, samples))
      }
    }.toDF("asset_id", "media")
    ext.Multimodal.decodeAudios(assets)
      .select(col("asset_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("rms"), col("zero_crossings"), col("peak"))
      .orderBy("asset_id")
  }
  private val Q89Duck =
    """SELECT doc_id AS asset_id,
      |  8000 AS sample_rate,
      |  1 AS channels,
      |  CAST(400 + (doc_id % 100) * 8 AS BIGINT) AS n_frames,
      |  CAST(128 + (doc_id % 50) * 16 AS DOUBLE) AS rms,
      |  CAST((400 + (doc_id % 100) * 8 - 1) // (1 + doc_id % 7) AS BIGINT)
      |    AS zero_crossings,
      |  CAST(128 + (doc_id % 50) * 16 AS INT) AS peak
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Q28 — content hashes structurally oracled: over the corpus plus an
   *  id-shifted copy of every document, fingerprint64 must collide
   *  EXACTLY on text equality — per doc, the same-fingerprint partner
   *  count equals the same-text partner count, and that count itself
   *  (`n_text_dups`) is data-derived: DuckDB re-computes it with a
   *  window over text. simhash64 must assign each doc and its planted
   *  copy the same value (identical token multiset). The raw 64-bit
   *  hash values stay covered by ExtSpec (not SQL-expressible). */
  private def fingerprintQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val doubled = docs.unionByName(
      docs.select(shiftedId(col("doc_id")).as("doc_id"), col("text")))
    // three consumers (fp-group, base, copies) — pin so the hash
    // projection over the doubled corpus runs once. Eager, and NARROW by
    // design: ids + two 64-bit hashes only — pinning the corpus text
    // itself would hold a full doubled-corpus copy in executor storage
    // for the returned plan's lifetime (and accumulate across repeated
    // bench invocations until GC-driven cleanup)
    val hashed = doubled.select(col("doc_id"),
      ext.functions.fingerprint64(col("text")).as("fp"),
      ext.functions.simhash64(ext.TextAnalysis.tokens(col("text"))).as("sh"))
      .localCheckpoint()
    // same-text partner counts ride one un-pinned scan of the raw corpus
    val ntxtPerDoc = doubled
      .withColumn("ntxt", count(lit(1)).over(Window.partitionBy("text")))
      .select(col("doc_id"), col("ntxt"))
    val byFp = hashed.groupBy("fp").agg(count(lit(1)).as("nfp"))
    val base = hashed.filter(col("doc_id") < PlantShift)
    val copies = hashed.filter(col("doc_id") >= PlantShift)
      .select((col("doc_id") - PlantShift).as("doc_id"),
        col("fp").as("fp_copy"), col("sh").as("sh_copy"))
    base.join(byFp, "fp").join(ntxtPerDoc, "doc_id").join(copies, "doc_id")
      .select(col("doc_id"),
        (col("ntxt") - 1).cast("int").as("n_text_dups"),
        (col("nfp") === col("ntxt")).as("fp_consistent"),
        (col("fp") === col("fp_copy") && col("sh") === col("sh_copy"))
          .as("copy_hashes_match"))
      .orderBy("doc_id")
  }
  private val Q28Duck =
    """SELECT doc_id,
      |  CAST(2 * count(*) OVER (PARTITION BY text) - 1 AS INT) AS n_text_dups,
      |  true AS fp_consistent, true AS copy_hashes_match
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q45 — IVF-Flat ANN with every inverted list probed: assignment +
   *  probe-join machinery verified exactly (exhaustive probing ≡ brute
   *  force, so the q22 oracle applies verbatim). */
  private def ivfTopKQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    ext.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nProbe = 16)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "n_id")
  }

  /** Q67 — the persistable-IVF serving path: the index (centroid +
   *  inverted-list frames) is built once per scale dir, STORED as
   *  snapshot tables, read back, and probed with nProbe = nlist —
   *  exhaustive probing makes the stored-index path exact, so the q22
   *  brute-force oracle applies verbatim. What this adds over q45: the
   *  probe runs against table-persisted frames (build-once /
   *  probe-forever, one training cost amortized over every later
   *  query), and the measured steady-state cost is the probe alone —
   *  the serving pattern at 100 TB, where retraining per query would
   *  dwarf the search. */
  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap[String, ext.Similarity.IvfIndex]()

  private def ivfStoredQuery(s: SparkSession, dir: String): DataFrame = {
    val stored = ivfIndexCache.getOrElseUpdate(dir, {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val idx = ext.Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
      val cent = SnapshotTable.create(s,
        trackedTempDir("graft_ivf_cent").toString, idx.centroids)
      val asg = SnapshotTable.create(s,
        trackedTempDir("graft_ivf_asg").toString, idx.assigned)
      ext.Similarity.IvfIndex(cent.read(), asg.read())
    })
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    ext.Similarity.ivfProbe(stored, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 16)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id", "n_id")
  }

  /** Q118 — the PERSISTED IVF lifecycle end-to-end
   *  ([[ext.Similarity.buildIvfIndexTables]] →
   *  [[ext.Similarity.ivfAppendTo]] → [[ext.Similarity.ivfProbeIndexed]];
   *  what it adds over q67's stored frames: quantizer-FINGERPRINT-pinned
   *  snapshot tables, incremental growth under the stored quantizer, and
   *  a probe that KEY-PRUNES the assigned table's files by the probed
   *  list ids — the ANN serving analogue of q117's indexed dedup serve).
   *  The index is BUILT on the even vectors, GROWN with the odd vectors,
   *  and probed file-pruned with nProbe = nlist, which makes the search
   *  exhaustive over build+append — so the q22 brute-force oracle
   *  applies verbatim, and a missing append, a wrong-list assignment, or
   *  an over-eager file prune all fail the hash outright. Pruning
   *  strictness and the mixed-quantizer refusal are ExtSpec-pinned. */
  private val ivfTableCache =
    scala.collection.concurrent.TrieMap[String, ext.Similarity.IvfIndexTables]()

  private def ivfIndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val t = ivfTableCache.getOrElseUpdate(dir, {
      val tt = ext.PhaseLog.timed("build")(ext.Similarity.buildIvfIndexTables(s,
        trackedTempDir("graft_q118c").toString,
        trackedTempDir("graft_q118a").toString,
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 16))
      ext.PhaseLog.timed("append")(ext.Similarity.ivfAppendTo(tt,
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding"))
      tt
    })
    ext.PhaseLog.timed("serve_plan")(
      ext.Similarity.ivfProbeIndexed(t, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 16)
        .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
        .orderBy("q_id", "n_id"))
  }

  /** Q119 — the persisted lifecycle for the SQ8 index (q118's
   *  discipline on q84's operator): quantizer-pinned tables, int8 lists
   *  grown under the stored quantizer, probe file-pruned to the probed
   *  lists. Built on the even ids of q84's doubled corpus, grown with
   *  the odd ids, probed exhaustively — so q84's brute-force-SQ8 oracle
   *  (Q79Duck) applies verbatim over build+append. */
  private val ivfSq8TableCache =
    scala.collection.concurrent.TrieMap[String, ext.Similarity.IvfIndexTablesSq8]()

  private def ivfSq8IndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    val t = ivfSq8TableCache.getOrElseUpdate(dir, {
      val tt = ext.PhaseLog.timed("build")(ext.Similarity.buildIvfIndexTablesSq8(s,
        trackedTempDir("graft_q119c").toString,
        trackedTempDir("graft_q119a").toString,
        doubled.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 16))
      ext.PhaseLog.timed("append")(ext.Similarity.ivfAppendToSq8(tt,
        doubled.filter(col("vec_id") % 2 === 1), "vec_id", "embedding"))
      tt
    })
    ext.PhaseLog.timed("serve_plan")(
      ext.Similarity.ivfProbeIndexedSq8(t, doubled.filter(col("vec_id") < 25),
          "vec_id", "embedding", k = 3, nProbe = 16)
        .select(col("q_id"), col("n_id"), round(col("qcos"), 4).as("qcos"))
        .orderBy("q_id", "n_id"))
  }

  /** Q120 — the persisted lifecycle for the PQ index (q118/q119's
   *  discipline on q87's operator, completing the stored-ANN family):
   *  THREE pinned tables — the codebooks join the pair, because a
   *  drifted or mispaired codebook silently MIS-DECODES every stored
   *  code, the PQ-specific hazard the second fingerprint closes — grown
   *  under the stored quantizers (assignment + residual coding both
   *  map-side), ADC winnowing over the probed lists' files, exact
   *  refine on the survivors. Built on the even ids of q87's doubled
   *  corpus, grown with the odd ids, probed exhaustively with refine —
   *  q87's structural oracle (each probe's refined top-1 is its planted
   *  copy at cosine 1.0) applies verbatim, so a missed append, a
   *  mis-decoded list, or an over-eager prune fails the hash. */
  private val ivfPqTableCache =
    scala.collection.concurrent.TrieMap[String, ext.Similarity.IvfIndexTablesPq]()

  private def ivfPqIndexedQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    val t = ivfPqTableCache.getOrElseUpdate(dir, {
      val tt = ext.PhaseLog.timed("build")(ext.Similarity.buildIvfIndexTablesPq(s,
        trackedTempDir("graft_q120c").toString,
        trackedTempDir("graft_q120b").toString,
        trackedTempDir("graft_q120a").toString,
        doubled.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nlist = 16, m = 8, ksub = 16))
      ext.PhaseLog.timed("append")(ext.Similarity.ivfAppendToPq(tt,
        doubled.filter(col("vec_id") % 2 === 1), "vec_id", "embedding"))
      tt
    })
    ext.PhaseLog.timed("serve_plan")(
      ext.Similarity.ivfProbeIndexedPqRefined(t, doubled,
          doubled.filter(col("vec_id") < 25), "vec_id", "embedding",
          k = 1, nProbe = 16, refine = 50)
        .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
        .orderBy("q_id"))
  }

  /** Q121 — STREAMING ANN ingest
   *  ([[graft.streaming.StreamIngest.ivfIngestSink]] — the stored-ANN
   *  family's streaming half, closing it the way q114's
   *  `dedupIngestSink` closed dedup's): the IVF index is BUILT on the
   *  even vectors (pinned tables, q118's lifecycle), the odd vectors
   *  are committed to a source snapshot table in THREE versions, and
   *  `readStream.format("graft-table")` replays them as three paced
   *  micro-batches through the sink — each batch assigned map-side
   *  under the stored quantizer (fingerprint-checked per batch) and
   *  landed as one atomic idempotent `stream-<batchId>` commit. The
   *  probe runs nProbe = nlist, exhaustive over build+stream = the
   *  whole corpus, so the q22 brute-force oracle applies verbatim — a
   *  lost or double-applied micro-batch changes the served neighbor
   *  set and fails the hash; `paced_batches` structurally asserts one
   *  stream commit per source version reached the assigned table's
   *  log. Exactly-once under re-delivery is ExtSpec-pinned. */
  private val ivfStreamTableCache =
    scala.collection.concurrent.TrieMap[String, ext.Similarity.IvfIndexTables]()

  private def ivfStreamQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val t = ivfStreamTableCache.getOrElseUpdate(dir, {
      val tt = ext.PhaseLog.timed("build")(ext.Similarity.buildIvfIndexTables(s,
        trackedTempDir("graft_q121c").toString,
        trackedTempDir("graft_q121a").toString,
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 16))
      val src = ext.PhaseLog.timed("source_commits") {
        val sc = SnapshotTable.create(s,
          trackedTempDir("graft_q121s").toString,
          emb.filter(col("vec_id") % 6 === 1))
        sc.append(emb.filter(col("vec_id") % 6 === 3))
        sc.append(emb.filter(col("vec_id") % 6 === 5))
        sc
      }
      val ckpt = trackedTempDir("graft_q121k").toString
      ext.PhaseLog.timed("stream_ingest") {
        (1 to 3).foreach { _ =>
          val stream = s.readStream.format("graft-table")
            .option("path", src.root)
            .option("maxVersionsPerTrigger", "1")
            .load()
          graft.streaming.StreamIngest.runOnce(
            graft.streaming.StreamIngest.ivfIngestSink(
              stream, tt, "vec_id", "embedding"), ckpt)
        }
      }
      tt
    })
    val paced =
      t.assigned.history().count(_.action.startsWith("stream-")) == 3
    ext.Similarity.ivfProbeIndexed(t, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 16)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .withColumn("paced_batches", lit(paced))
      .orderBy("q_id", "n_id")
  }
  private val Q121Duck =
    """WITH scored AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
      |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      |  WHERE a.vec_id < 10),
      |ranked AS (
      |  SELECT q_id, n_id, c,
      |         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
      |  FROM scored)
      |SELECT q_id, n_id, round(c, 4) AS cos, TRUE AS paced_batches
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, n_id""".stripMargin

  /** Q122 — VACUUM + retention as a gated query (the maintenance surface
   *  q111's foreign-reader technique applied to garbage collection; the
   *  SQL statement form stays MaintenanceSqlSpec-covered): a table takes
   *  three deterministic mutations, a TAG pins the post-update version
   *  as a retention promise, then `vacuum(retainVersions = 1,
   *  retainMillis = 0)` reclaims every dead file and expires the old log
   *  slots. The declared result reads BOTH faces afterwards — the head
   *  (v3) and the tag (v1, resolved from the entry copy the vacuum
   *  embeds in the ref once its log slot expires) — and the oracle
   *  replays both from the base table. A file reclaimed too eagerly
   *  (tag-live files, the stale-reader hazard that breaks foreign
   *  engines) kills the tag read or its hash; a vacuum that reclaims
   *  NOTHING fails the structural `files_reclaimed` column. Built once
   *  per scale dir (a vacuumed table cannot restore to its pristine
   *  version — the old slots are gone by design); reps re-read the two
   *  faces. */
  private val vacuumCache = scala.collection.concurrent.TrieMap[
    String, (SnapshotTable, Boolean)]()

  private def vacuumRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val base = customer.select(col("c_custkey").as("id"),
      col("c_mktsegment").as("state"), col("c_acctbal").as("bal"))
    val (t, reclaimed) = vacuumCache.getOrElseUpdate(dir, {
      val tt = SnapshotTable.create(s,
        trackedTempDir("graft_q122").toString,
        base.repartitionByRange(4, col("id")))                            // v0
      tt.update(col("id") % 5 === 0, Map("state" -> lower(col("state")))) // v1
      tt.createTag("audit") // retention promise: v1's files stay alive
      tt.delete(col("id") % 7 === 3)                                      // v2
      tt.update(col("id") % 3 === 1, Map("bal" -> (col("bal") * 2)))      // v3
      val n = tt.vacuum(retainVersions = 1, retainMillis = 0L)
      (tt, n > 0)
    })
    t.read().withColumn("which", lit("head"))
      .unionByName(t.readTag("audit").withColumn("which", lit("tag")))
      .select(col("which"), col("id"), col("state"),
        round(col("bal"), 2).as("bal"), lit(reclaimed).as("files_reclaimed"))
      .orderBy("which", "id")
  }
  private val Q122Duck =
    """WITH base AS (SELECT c_custkey AS id, c_mktsegment AS state,
      |                     c_acctbal AS bal FROM customer),
      |s1 AS (SELECT id, CASE WHEN id % 5 = 0 THEN lower(state) ELSE state END AS state,
      |              bal FROM base),
      |head AS (SELECT id, state,
      |                CASE WHEN id % 3 = 1 THEN bal * 2 ELSE bal END AS bal
      |         FROM s1 WHERE id % 7 <> 3)
      |SELECT 'head' AS which, id, state, round(bal, 2) AS bal,
      |       TRUE AS files_reclaimed FROM head
      |UNION ALL
      |SELECT 'tag', id, state, round(bal, 2), TRUE FROM s1
      |ORDER BY which, id""".stripMargin

  /** Q123 — KLL ESTIMATOR regime as a gated query (q109 pins the exact
   *  regime cross-engine; this declares the compacting regime's
   *  CONTRACT): per-language length quantiles at k = 64 — under the
   *  per-language row counts at every shipped SF, so compaction really
   *  fires — checked against the sketch's rank-error envelope computed
   *  EXACTLY over the data (one equi-join + hash-agg, no window). The
   *  emitted row is (lang, q_idx, n, within_envelope): the booleans are
   *  deterministic across merge orders precisely because the envelope
   *  is the estimator's portable invariant, and `n` keeps the row tied
   *  to real data. Byte-level cross-engine replay of the compaction is
   *  OUT OF SCOPE by design: level-0 fill order and the partial-merge
   *  tree are scheduler-dependent, so the served VALUE is not a
   *  portable quantity — the rank-error contract is (SURVEY §6). The
   *  envelope is the spec's 3–5% regression band plus the 1/n rank
   *  granularity, so the exact regime (tiny languages at sf0.001)
   *  passes through the same check. */
  private def kllEnvelopeQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("n_chars").cast("double").as("v"))
    val qs = Seq(0.25, 0.5, 0.75)
    val est = docs.groupBy("lang")
      .agg(ext.functions.quantileSketchMulti(col("v"), qs, 64).as("est"))
      .select(col("lang"), posexplode(col("est")).as(Seq("qi", "v_est")))
    val q = when(col("qi") === 0, 0.25)
      .when(col("qi") === 1, 0.5).otherwise(0.75)
    docs.join(est, "lang")
      .groupBy("lang", "qi", "v_est")
      .agg(sum(when(col("v") <= col("v_est"), 1L).otherwise(0L)).as("n_le"),
        count(lit(1)).as("n"))
      .select(col("lang"), col("qi").cast("long").as("q_idx"), col("n"),
        (abs(col("n_le").cast("double") / col("n") - q) <=
          lit(0.05) + lit(1.0) / col("n")).as("within_envelope"))
      .orderBy("lang", "q_idx")
  }
  private val Q123Duck =
    """SELECT lang, CAST(t.q_idx AS BIGINT) AS q_idx, count(*) AS n,
      |       TRUE AS within_envelope
      |FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(q_idx)
      |GROUP BY lang, t.q_idx ORDER BY lang, q_idx""".stripMargin

  /** Q29 — hyperplane-LSH ANN structurally oracled (q49 technique
   *  inlined): an identical id-shifted copy of every vector is planted;
   *  identical vectors collide in EVERY bucket, so the operator must
   *  return each probe's copy (recall), the exact-cosine re-rank must
   *  place it first (ranking precision), and its cosine must be 1
   *  (re-rank exactness). DuckDB replays all three as constants over the
   *  probe set; raw approximate neighbor lists stay ExtSpec-covered. */
  private def lshTopKQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    val probes = emb.filter(col("vec_id") < 10)
    val dup = ext.Similarity.lshTopK(doubled, probes, "vec_id", "embedding", k = 5)
      .filter(col("n_id") === col("q_id") + lit(PlantShift))
      .select(col("q_id"), (col("rank") === 1).as("first"),
        round(col("cos"), 4).as("cos"))
    probes.select(col("vec_id").as("q_id"))
      .join(dup, Seq("q_id"), "left")
      .select(col("q_id"),
        col("first").isNotNull.as("dup_found"),
        coalesce(col("first"), lit(false)).as("dup_first"),
        coalesce(col("cos"), lit(0.0)).as("dup_cos"))
      .orderBy("q_id")
  }
  private val Q29Duck =
    """SELECT CAST(vec_id AS BIGINT) AS q_id, true AS dup_found,
      |  true AS dup_first, 1.0 AS dup_cos
      |FROM embeddings WHERE vec_id < 10 ORDER BY q_id""".stripMargin

  /** Q50 — n-gram repetition ratio (the Gopher-style duplicate-trigram
   *  quality filter), formula replayed verbatim in the oracle. */
  private def repetitionQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        round(ext.TextAnalysis.repetitionRatio(col("text"), 3), 6).as("rep_ratio"))
      .orderBy("doc_id")
  private val Q50Duck =
    """SELECT doc_id,
      |  round(CASE WHEN len(t) - 2 > 0
      |    THEN 1.0 - len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                  for i in range(1, len(t)-1)]))*1.0 / (len(t) - 2)
      |    ELSE 0.0 END, 6) AS rep_ratio
      |FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Q51 — PII scrub + whitespace/case normalization
   *  ([[ext.TextAnalysis.scrubPii]] ∘ [[ext.TextAnalysis.normalize]]).
   *  The fixture corpus has no URLs/emails/IPs, so three planted rows
   *  exercise each redaction pattern; the RE2-compatible regexes are
   *  replayed verbatim by the DuckDB oracle (`'g'` flag — DuckDB replaces
   *  only the first match by default, Spark replaces all). */
  private def scrubQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val planted = Seq(
      (9000001L, "Contact John.Doe+spam@Example.COM or visit https://example.com/a?b=c now"),
      (9000002L, "server 192.168.0.1 mailed admin@test.org via http://t.co/xyz"),
      (9000003L, "  Multiple   spaces   and   MIXED Case  "))
      .toDF("doc_id", "text")
    docs.unionByName(planted)
      .select(col("doc_id"),
        ext.TextAnalysis.normalize(ext.TextAnalysis.scrubPii(col("text"))).as("clean_text"))
      .orderBy("doc_id")
  }
  private val Q51Duck =
    """SELECT doc_id,
      |  lower(trim(regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text, 'https?://\S+', '<URL>', 'g'),
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\s+', ' ', 'g'))) AS clean_text
      |FROM (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (9000001, 'Contact John.Doe+spam@Example.COM or visit https://example.com/a?b=c now'),
      |    (9000002, 'server 192.168.0.1 mailed admin@test.org via http://t.co/xyz'),
      |    (9000003, '  Multiple   spaces   and   MIXED Case  ')) v(doc_id, text))
      |ORDER BY doc_id""".stripMargin

  /** Q52 — reproducible data mixing ([[ext.Sampling.mixByGroup]]): keep
   *  90% of en, 50% of de, 25% of fr, 10% of es, drop zh, selected by the
   *  engine-portable arithmetic id hash — the DuckDB oracle replays the
   *  identical BIGINT arithmetic, so the exact selected document set must
   *  match (the point of deterministic sampling). */
  private def mixSampleQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    ext.Sampling.mixByGroup(docs, "doc_id", "lang",
        Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }
  private val Q52Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt
    def thr(f: Double) = ext.Sampling.threshold(f)
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    (((doc_id % $m) * $a + $salt) % $m * $a + $salt) % $m AS b
       |  FROM documents)
       |WHERE (lang = 'en' AND b < ${thr(0.9)})
       |   OR (lang = 'de' AND b < ${thr(0.5)})
       |   OR (lang = 'fr' AND b < ${thr(0.25)})
       |   OR (lang = 'es' AND b < ${thr(0.1)})
       |ORDER BY doc_id""".stripMargin
  }

  /** Q53 — sliding-window document chunking
   *  ([[ext.TextAnalysis.chunkDocs]], 32-token windows advancing by 24):
   *  the oracle re-derives every window with the same slice arithmetic,
   *  so chunk boundaries and overlap must match exactly. */
  private def chunkQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.chunkDocs(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        chunkTokens = 32, stride = 24)
      .select(col("doc_id"), col("chunk_idx"),
        ext.TextAnalysis.tokenCount(col("chunk_text")).as("chunk_tokens"),
        col("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  private val Q53Duck =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24) AS INT) + 1 AS nc
      |  FROM t)
      |SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
      |  CAST(len(list_slice(toks, (i-1)*24 + 1, (i-1)*24 + 32)) AS INT) AS chunk_tokens,
      |  array_to_string(list_slice(toks, (i-1)*24 + 1, (i-1)*24 + 32), ' ') AS chunk_text
      |FROM (SELECT doc_id, toks, unnest(generate_series(1, nc)) AS i FROM c)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Q54 — benchmark decontamination ([[ext.Decontaminate.flag]]): every
   *  doc sharing a word 5-gram with the "benchmark" slice (doc_id % 20 =
   *  3 stands in for an eval set) is flagged. The engine joins on 64-bit
   *  hashed shingles; the oracle replays the same n-grams as strings —
   *  identical sets modulo 2⁻⁶⁴ collisions (the q21/q25 argument). */
  private def decontamQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 20 === 3).select(col("text"))
    ext.Decontaminate.flag(docs, "doc_id", "text", bench, "text", n = 5)
      .select(col("doc_id"), col("contaminated"))
      .orderBy("doc_id")
  }
  private val Q54Duck =
    """WITH sh AS (
      |  SELECT doc_id, unnest([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
      |                         for i in range(1, len(t)-3)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |contam AS (
      |  SELECT DISTINCT a.doc_id
      |  FROM sh a JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 3) b USING (s))
      |SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      |FROM documents d LEFT JOIN contam c USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Q105 — contamination overlap REPORT
   *  ([[ext.Decontaminate.overlapReport]]): q54's probe graded into the
   *  per-document distinct-5-gram overlap fraction — the score
   *  threshold-based decontamination policies (GPT-3 appendix / Llama
   *  data papers) cut on; q54's boolean is the `frac > 0` special case.
   *  Hashed-gram counts vs the oracle's string grams: identical modulo
   *  2⁻⁶⁴ collisions, the q21/q25 argument. */
  private def overlapReportQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 20 === 3).select(col("text"))
    ext.Decontaminate.overlapReport(docs, "doc_id", "text", bench, "text", n = 5)
      .select(col("id").as("doc_id"), col("matched"), col("total"),
        round(col("frac"), 4).as("frac"))
      .orderBy("doc_id")
  }
  private val Q105Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |  unnest(list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
      |                        for i in range(1, len(t) - 3)])) AS s
      |  FROM t),
      |b AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 3),
      |m AS (SELECT sh.doc_id, count(*) AS total, count(b.s) AS matched
      |      FROM sh LEFT JOIN b ON sh.s = b.s GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(matched, 0) AS BIGINT) AS matched,
      |  CAST(coalesce(total, 0) AS BIGINT) AS total,
      |  round(CASE WHEN coalesce(total, 0) = 0 THEN 0.0
      |        ELSE matched::DOUBLE / total END, 4) AS frac
      |FROM documents d LEFT JOIN m USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Q106 — temperature-balanced mixing
   *  ([[ext.Sampling.temperatureMix]], the mT5/XLM-R multilingual
   *  sampling rule): per-language keep rates derived from
   *  count^(1/T)/Σcount^(1/T) against a 2000-row target, selection by
   *  the engine-portable id-hash arithmetic. T = 0.5 makes the power
   *  exact (w = c², integer-exact in doubles), so the oracle replays
   *  the WHOLE derivation — counts → weights → clamped 1e-6-grid rates
   *  → thresholds — plus the selection, and the exact chosen document
   *  set must match. */
  private def temperatureMixQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    ext.Sampling.temperatureMix(docs, "doc_id", "lang",
        targetRows = 2000L, temperature = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }
  private val Q106Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt
    s"""WITH c AS (SELECT lang, count(*) AS c FROM documents
       |           WHERE lang IS NOT NULL GROUP BY 1),
       |z AS (SELECT sum(c * c) AS z FROM c),
       |f AS (SELECT lang,
       |        floor(least(1.0::DOUBLE, (2000 * c * c)::DOUBLE / (z * c)::DOUBLE)
       |              * 1000000) / 1000000 AS f
       |      FROM c CROSS JOIN z),
       |b AS (SELECT doc_id, lang,
       |        (((doc_id % $m) * $a + $salt) % $m * $a + $salt) % $m AS b
       |      FROM documents)
       |SELECT doc_id, lang FROM b JOIN f USING (lang)
       |WHERE b < CAST(floor(f * $m) AS BIGINT)
       |ORDER BY doc_id""".stripMargin
  }

  /** Q107 — corpus length-distribution profiling: per-language
   *  p50/p90/p99 token counts via SQL-standard `PERCENTILE_DISC` — the
   *  numbers a pipeline reads off to PICK its length-filter thresholds
   *  (q73's rules consume exactly such cutoffs). DISC, not CONT, on
   *  purpose: discrete percentiles return actual data values (integers
   *  here), so the cross-engine comparison is exact with no
   *  interpolation arithmetic to align. Stock Spark exact percentile —
   *  a one-shuffle sort-based aggregate; for streaming/mergeable
   *  profiling at 100 TB the KMV/TopItems sketch family (q58/q60/q95)
   *  is the bounded-memory counterpart. */
  private val Q107 =
    """SELECT lang,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p50,
      |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p90,
      |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n) AS BIGINT) AS p99,
      |  count(*) AS docs
      |FROM (SELECT lang, size(split(text, ' ')) AS n FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin
  private val Q107Duck =
    """SELECT lang,
      |  CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
      |  CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
      |  CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
      |  count(*) AS docs
      |FROM (SELECT lang, len(string_split(text, ' ')) AS n FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Q108 — fill-in-middle transformation
   *  ([[ext.TextAnalysis.fimTransform]], Bavarian et al. 2022 — the
   *  Codex/StarCoder code-data prep): a deterministic half of the
   *  corpus rewrites PSM-style (`<PRE>prefix<SUF>suffix<MID>middle`,
   *  cut points from the id-hash streams), the rest passes through.
   *  Selection AND both character cuts are the engine-portable BIGINT
   *  arithmetic, so the oracle replays the transformed corpus down to
   *  the character. */
  private def fimQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.fimTransform(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", rate = 0.5)
      .select(col("doc_id"), col("fim"), col("text_fim"))
      .orderBy("doc_id")
  private val Q108Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val s0 = ext.Sampling.DefaultSalt
    val (s1, s2) = (s0 + 1, s0 + 2)
    val thr = ext.Sampling.threshold(0.5)
    s"""WITH b AS (SELECT doc_id, text, length(text) AS len,
       |  (((doc_id % $m) * $a + $s0) % $m * $a + $s0) % $m AS b0,
       |  (((doc_id % $m) * $a + $s1) % $m * $a + $s1) % $m AS b1,
       |  (((doc_id % $m) * $a + $s2) % $m * $a + $s2) % $m AS b2
       |  FROM documents),
       |p1c AS (SELECT *, CAST(b1 % (len + 1) AS INT) AS p1 FROM b),
       |p2c AS (SELECT *, p1 + CAST(b2 % (len - p1 + 1) AS INT) AS p2 FROM p1c)
       |SELECT doc_id, (b0 < $thr) AS fim,
       |  CASE WHEN b0 < $thr THEN
       |    '<PRE>' || substr(text, 1, p1) || '<SUF>' ||
       |    substr(text, p2 + 1, len - p2) || '<MID>' ||
       |    substr(text, p1 + 1, p2 - p1)
       |  ELSE text END AS text_fim
       |FROM p2c ORDER BY doc_id""".stripMargin
  }

  /** Q48 — embedding cosine near-dup pairs ([[ext.Dedup.embeddingPairs]],
   *  hyperplane-LSH bucket join + exact cosine filter; the default path
   *  auto-sizes (planes, seeds) from the corpus row count, so per-bucket
   *  load stays flat as the corpus scales). The embeddings fixture has NO
   *  planted near-dups (max background cosine ≈ 0.51), so the query
   *  plants them deterministically: an id-shifted identical copy of every
   *  vector. Identical vectors collide in EVERY LSH bucket under any
   *  geometry, so recall of the (i, i+offset) pairs is structural — and
   *  the cos ≥ 0.95 filter excludes every background pair exactly, making
   *  the DuckDB exact pair list a precise oracle. */
  private def embeddingPairsQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    ext.Dedup.embeddingPairs(doubled, "vec_id", "embedding", minCos = 0.95)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }
  private val Q48Duck =
    """WITH base AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT CAST(vec_id AS BIGINT) + 1000000, embedding FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
      |  FROM base a JOIN base b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(c, 4) AS cos FROM pairs WHERE c >= 0.95
      |ORDER BY id_a, id_b""".stripMargin

  /** Q102 — auto-sized embedding near-dup pairs at a TIGHTENED recall
   *  floor (targetRecall 0.99 vs q48's default 0.90, via the historical
   *  [[ext.Dedup.embeddingPairsAuto]] alias): auto-sizing became
   *  [[ext.Dedup.embeddingPairs]]'s default in round 9, so q102 now
   *  exercises the SEED-SCALING axis of [[ext.Similarity
   *  .autoLshParams]] — the recall floor multiplies the seed count
   *  while the plane count holds, and the single-scan base makes extra
   *  seeds cheap. The RESULT is provably geometry-independent here:
   *  identical planted copies collide in every bucket under any
   *  (planes, seeds), and every extra candidate the added seeds surface
   *  is removed by the exact cos ≥ 0.95 filter — so q48's oracle
   *  applies unchanged, and a result drift under the tighter geometry
   *  would flag a candidate-generation bug, not a fixture change. */
  private def embeddingPairsAutoQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    ext.Dedup.embeddingPairsAuto(doubled, "vec_id", "embedding", minCos = 0.95,
        targetRecall = 0.99)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** Q103 — hybrid retrieval via reciprocal-rank fusion
   *  ([[ext.Search.rrfFuse]], Cormack et al. SIGIR'09 — the lexical ∪
   *  dense combiner every RAG / hard-negative-mining stack runs): BM25
   *  top-20 (q72's retriever) fused with embedding-cosine top-20 (q22's
   *  retriever, probe = vector 0) by summed reciprocal ranks — no score
   *  calibration, which is RRF's point. Both component rankings are
   *  already oracle-proven; the oracle replays them AND the fusion
   *  (exact IEEE divisions, ≤2-term sums) to the exact fused order. */
  private def rrfFuseQuery(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = ext.Search.bm25TopK(
        s.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", query = "vector merge stream", k = 20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val dense = ext.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 20)
      .select(col("n_id").as("doc_id"), col("rank"))
    // rrfFuse rounds internally and ORDERS on the rounded score (ties by
    // id), exactly as the oracle's ORDER BY binds to its rounded alias
    ext.Search.rrfFuse(Seq(lex.select("doc_id", "rank"), dense),
        "doc_id", "rank", k = 10)
      .select(col("doc_id"), col("rrf"), col("n_lists"))
  }
  private val Q103Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tfq AS (SELECT doc_id, token, count(*) AS tf FROM tok
      |        WHERE token IN ('vector', 'merge', 'stream') GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tfq GROUP BY 1),
      |s AS (SELECT tfq.doc_id,
      |        round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
      |            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
      |      FROM tfq JOIN dfreq USING (token) JOIN dl USING (doc_id)
      |      CROSS JOIN stats GROUP BY tfq.doc_id),
      |lext AS (SELECT doc_id, bm25 FROM s ORDER BY bm25 DESC, doc_id LIMIT 20),
      |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      |        FROM lext),
      |q0 AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |dall AS (SELECT e.vec_id AS doc_id,
      |          list_cosine_similarity(e.embedding::DOUBLE[], q0.embedding::DOUBLE[]) AS c
      |         FROM embeddings e CROSS JOIN q0 WHERE e.vec_id <> 0),
      |den AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r
      |        FROM dall ORDER BY c DESC, doc_id LIMIT 20),
      |u AS (SELECT doc_id, 1.0::DOUBLE / (60 + r) AS contrib FROM lex
      |      UNION ALL SELECT doc_id, 1.0::DOUBLE / (60 + r) FROM den),
      |f AS (SELECT doc_id, sum(contrib) AS rrf, count(*) AS n_lists FROM u GROUP BY 1)
      |SELECT doc_id, round(rrf, 6) AS rrf, CAST(n_lists AS BIGINT) AS n_lists
      |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** Q104 — LINE-level dedup ([[ext.Dedup.dedupLines]], the CCNet/Dolma
   *  paragraph granularity between q20's whole-document dedup and q71's
   *  token-span removal): every distinct non-empty line keeps only its
   *  minimum-(doc, position) occurrence — the boilerplate-header removal
   *  pass. Three planted lines per doc ("header" everywhere, seg by
   *  id%7, tail by id%3) give every doc past id 6 a fully-deduplicated
   *  body, and the oracle replays the winner rule relationally
   *  (row_number over (line) ordered by (doc, pos)). */
  private def dedupLinesQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws("\n", lit("header"),
          concat(lit("seg"), col("doc_id") % 7),
          concat(lit("tail"), col("doc_id") % 3)).as("body"))
    ext.Dedup.dedupLines(docs, "doc_id", "body")
      .select(col("id").as("doc_id"), col("text_dedup"), col("n_removed"))
      .orderBy("doc_id")
  }
  private val Q104Duck =
    """WITH d AS (SELECT doc_id,
      |  ['header', 'seg' || (doc_id % 7), 'tail' || (doc_id % 3)] AS tk
      |  FROM documents),
      |l AS (SELECT doc_id, o.pos AS pos, o.line AS line FROM d,
      |      unnest([{'pos': i - 1, 'line': tk[i]}
      |              for i in range(1, len(tk) + 1)]) AS u(o)),
      |k AS (SELECT doc_id, pos, line,
      |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      |      FROM l),
      |agg AS (SELECT doc_id,
      |          string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
      |          count(*) AS n_kept
      |        FROM k WHERE rn = 1 GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(agg.text_dedup, '') AS text_dedup,
      |  CAST(3 - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      |FROM d LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Q79 — int8 scalar-quantized ANN ([[ext.Similarity.quantizedTopK]]):
   *  both sides quantize map-side to 4×-smaller int8 codes (SQ8), and
   *  scoring is the pure integer [[ext.functions.int8Cosine]] kernel —
   *  the per-vector scales cancel in the cosine, so the whole pipeline
   *  is integer arithmetic + one double division, replayed bit-exactly
   *  by DuckDB (floor(x/s + 0.5) rounding, integer dots ≪ 2⁵³). The
   *  planted id-shifted copies must surface at rank 1 with qcos exactly
   *  1.0 — identical vectors quantize to identical codes. */
  private def quantizedTopKQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    ext.Similarity.quantizedTopK(doubled,
        doubled.filter(col("vec_id") < 25), "vec_id", "embedding", k = 3)
      .select(col("q_id"), col("n_id"), round(col("qcos"), 4).as("qcos"))
      .orderBy("q_id", "n_id")
  }
  private val Q79Duck =
    """WITH base AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT CAST(vec_id AS BIGINT) + 1000000, embedding::DOUBLE[] FROM embeddings),
      |qz AS (
      |  SELECT vec_id,
      |         CASE WHEN s = 0 THEN list_transform(v, x -> 0.0)
      |              ELSE list_transform(v, x ->
      |                greatest(-127.0, least(127.0, floor(x / s + 0.5)))) END AS codes
      |  FROM (SELECT vec_id, v,
      |          list_max(list_transform(v, x -> abs(x))) / 127 AS s FROM base)),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |         CASE WHEN list_dot_product(q.codes, q.codes) = 0
      |                OR list_dot_product(c.codes, c.codes) = 0 THEN 0.0
      |              ELSE list_dot_product(q.codes, c.codes) /
      |                   (sqrt(list_dot_product(q.codes, q.codes)) *
      |                    sqrt(list_dot_product(c.codes, c.codes))) END AS qc
      |  FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 25),
      |ranked AS (
      |  SELECT q_id, n_id, qc,
      |         row_number() OVER (PARTITION BY q_id ORDER BY qc DESC, n_id) AS r
      |  FROM scored)
      |SELECT q_id, n_id, round(qc, 4) AS qcos FROM ranked WHERE r <= 3
      |ORDER BY q_id, n_id""".stripMargin

  /** Q84 — IVF-SQ8 serving path ([[ext.Similarity.ivfBuildQuantized]] /
   *  `ivfProbeQuantized`): the stored inverted lists carry int8 codes
   *  (4× smaller index — the FAISS production trade), probes quantize
   *  map-side, and re-ranking is the pure-integer int8 cosine. With
   *  `nProbe = nlist` the search is exhaustive, so the result must
   *  EQUAL the brute-force SQ8 ranking — q79's oracle applies
   *  verbatim, making cluster assignment, code storage, and the
   *  integer kernel all hash-checked at once. */
  private def ivfQuantizedQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    val index = ext.Similarity.ivfBuildQuantized(doubled, "vec_id", "embedding",
      nlist = 16)
    ext.Similarity.ivfProbeQuantized(index,
        doubled.filter(col("vec_id") < 25), "vec_id", "embedding",
        k = 3, nProbe = 16)
      .select(col("q_id"), col("n_id"), round(col("qcos"), 4).as("qcos"))
      .orderBy("q_id", "n_id")
  }

  /** Q87 — IVF-PQ with exact refine ([[ext.Similarity.ivfBuildPq]] /
   *  `ivfProbePqRefined`): the FAISS billion-scale serving shape —
   *  inverted lists store 8-byte residual PQ codes (32× smaller than
   *  the float payload), probing scores candidates by O(M) ADC table
   *  lookups, and only the top-`refine` candidates per probe fetch
   *  their full vectors for an exact cosine re-rank. ADC is lossy, so
   *  the oracle is STRUCTURAL: each probe's refined top-1 must be its
   *  planted identical copy at exactly cosine 1.0 (measured copy ADC
   *  rank ≤ 9 on both sf fixtures vs refine = 50; background cosines
   *  top out ≈ 0.49, so the exact re-rank is unambiguous). */
  private def ivfPqQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    val index = ext.Similarity.ivfBuildPq(doubled, "vec_id", "embedding",
      nlist = 16, m = 8, ksub = 16)
    ext.Similarity.ivfProbePqRefined(index, doubled,
        doubled.filter(col("vec_id") < 25), "vec_id", "embedding",
        k = 1, nProbe = 16, refine = 50)
      .select(col("q_id"), col("n_id"), round(col("cos"), 4).as("cos"))
      .orderBy("q_id")
  }
  private val Q87Duck =
    """SELECT CAST(vec_id AS BIGINT) AS q_id,
      |       CAST(vec_id AS BIGINT) + 1000000 AS n_id,
      |       1.0 AS cos
      |FROM embeddings WHERE vec_id < 25 ORDER BY q_id""".stripMargin

  /** Q68 — SemDeDup ([[ext.Dedup.semDedupPairs]]): k-means-clustered
   *  within-cluster cosine pair mining (the clustered sibling of q48's
   *  hyperplane-LSH miner). The oracle is EXACT, not structural: planted
   *  identical copies assign to the same centroid with certainty (same
   *  vector ⇒ same nearest list), background cosines top out ≈ 0.51 far
   *  under the 0.95 bar, so the within-cluster pair list must equal the
   *  full exact-cosine pair list DuckDB computes — cluster-recall failure
   *  or a wrong cosine kernel both break the hash. */
  private def semDedupQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
    ext.Dedup.semDedupPairs(doubled, "vec_id", "embedding", minCos = 0.95, nlist = 16)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /**
   * Q49 — correctness harness for the approximate trio that has no direct
   * SQL oracle (q26 simhash, q28 fingerprint, q29 LSH ANN). Each
   * operator is checked against STRUCTURAL ground truth on a corpus
   * doubled with id-shifted identical copies — a planted duplicate is
   * found by these operators with certainty (hamming 0 / equal
   * fingerprint / same LSH bucket under every seed), so the booleans are
   * scale-factor-invariant, unlike recall-vs-exact-Jaccard thresholds
   * (measured simhash precision vs j≥0.8 swings 0.88 → 0.36 between
   * sf0.01 and sf0.1 purely from the fixture's background text — a
   * threshold gate there would measure the fixture, not the operator).
   * Each row carries `n_ref` (the planted-reference size, data-derived
   * and re-computed verbatim by the DuckDB oracle) plus two booleans:
   *
   *  - `fingerprint`: fingerprint-equality pairs must EQUAL
   *    text-equality pairs (recall and precision exactly 1);
   *  - `simhash`: every planted pair recovered (recall), and the
   *    pigeonhole banding is decomposition-invariant — chunks=4 and
   *    chunks=8 return the SAME pair set (both are provably exact for
   *    hamming ≤ 3, so any banding/keying bug breaks the equality);
   *  - `lsh_topk`: every probe's planted duplicate is returned (recall)
   *    and ranked first by the exact-cosine re-rank (ranking stage).
   *
   * A broken operator (wrong banding, bad hashing, lost candidates,
   * broken re-rank) flips a boolean and fails the driver's hash match.
   */
  private def approxRecallQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic 1-in-5 sample: the structural checks are per-planted-
    // duplicate, so hundreds of docs give the same regression power as
    // thousands at a fifth of the harness cost; the oracle replays the
    // same predicate exactly
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
    def pin(df: DataFrame): DataFrame = df.localCheckpoint()
    val (doubled, nDocs) = ext.PhaseLog.timed("prep_corpus") {
      (pin(docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(docs.select(shiftedId(col("doc_id")).as("doc_id"), col("text")))),
        docs.count())
    }
    // Harness cost discipline, two axes: (1) each metric family is ONE
    // Spark job — a full-outer join of the two pair sets (unique
    // (id_a, id_b) keys on both sides by construction) with marker
    // columns, folded to all its counts in a single aggregate (the
    // earlier one-count-one-job shape spent more wall-clock on per-job
    // fixed overhead than on work); (2) the three families are
    // INDEPENDENT, so their jobs run concurrently — SparkSession actions
    // are thread-safe, and the small stages of one family fill the cores
    // the others leave idle. Results are collected values, so
    // concurrency cannot affect the output.
    // q26 operator under test: simhash pigeonhole candidates on the
    // doubled corpus, under two different chunk decompositions. The
    // signature pass (tokenize + simhash — the dominant corpus scan) is
    // computed ONCE and checkpointed; each decomposition re-bands the
    // same pinned signatures instead of rescanning the corpus.
    val sigs = ext.PhaseLog.timed("prep_signatures")(
      pin(doubled.filter(col("text").isNotNull)
        .select(col("doc_id"),
          ext.functions.simhash64(ext.TextAnalysis.tokens(col("text"))).as("sh"))))
    // q28 operator under test: fingerprint64 as an exact-dup detector;
    // ground truth = text-equality pairs on the same doubled corpus
    val fps = pin(doubled.select(col("doc_id"),
      ext.functions.fingerprint64(col("text")).as("fp")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // the three metric families run CONCURRENTLY — their phase walls
    // overlap by design (sum of phases > query wall is expected here);
    // each phase still attributes its family's own latency
    val simF = Future { ext.PhaseLog.timed("family_simhash") {
      val sim4 = ext.Dedup.simhashPairsFromSignatures(sigs, "doc_id", "sh",
          maxHamming = 3, chunks = 4)
        .select(col("id_a"), col("id_b")).withColumn("m4", lit(true))
      val sim8 = ext.Dedup.simhashPairsFromSignatures(sigs, "doc_id", "sh",
          maxHamming = 3, chunks = 8)
        .select(col("id_a"), col("id_b")).withColumn("m8", lit(true))
      sim4.join(sim8, Seq("id_a", "id_b"), "full_outer")
        .agg(count(col("m4")).as("n4"), count(col("m8")).as("n8"),
          count(when(col("m4") && col("m8"), 1)).as("nBoth"),
          count(when(col("m4") && col("id_b") === col("id_a") + lit(PlantShift), 1))
            .as("planted"))
        .head()
    } }
    val fpF = Future { ext.PhaseLog.timed("family_fingerprint") {
      val fpPairs = fps.alias("a")
        .join(fps.alias("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .withColumn("mf", lit(true))
      val txtPairs = doubled.alias("a")
        .join(doubled.alias("b"),
          col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .withColumn("mt", lit(true))
      fpPairs.join(txtPairs, Seq("id_a", "id_b"), "full_outer")
        .agg(count(col("mf")).as("nFp"), count(col("mt")).as("nTxt"),
          count(when(col("mf") && col("mt"), 1)).as("fpHits"))
        .head()
    } }
    // q29 operator under test: hyperplane-LSH ANN. The fixture's true
    // top-k neighbors sit at cos ≈ 0.5, which 8-plane LSH collides on
    // only ~10% of the time — BY DESIGN (LSH finds near-dups, not distant
    // neighbors), so recall-vs-brute-force would measure the fixture, not
    // the operator. Instead plant an identical copy of every vector
    // (id-shifted): identical vectors collide in every bucket, so the
    // operator MUST return each probe's duplicate (recall structural) and
    // the exact-cosine re-rank MUST place it first (precision of the
    // ranking stage).
    val lshF = Future { ext.PhaseLog.timed("family_lsh") {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val dupEmb = emb.unionByName(
        emb.select(shiftedId(col("vec_id")).as("vec_id"), col("embedding")))
      val probes = emb.filter(col("vec_id") < 10)
      val lsh = ext.Similarity.lshTopK(dupEmb, probes, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("n_id"), col("rank"))
      val nProbes = probes.count()
      val isDup = col("n_id") === col("q_id") + lit(PlantShift)
      val r = lsh.agg(count(when(isDup, 1)).as("nDupHits"),
        count(when(isDup && col("rank") === 1, 1)).as("nDupTop1")).head()
      (nProbes, r.getLong(0), r.getLong(1))
    } }
    val simRow = Await.result(simF, Duration.Inf)
    val (n4, n8, nBoth, simPlanted) =
      (simRow.getLong(0), simRow.getLong(1), simRow.getLong(2), simRow.getLong(3))
    val fpRow = Await.result(fpF, Duration.Inf)
    val (nFp, nTxt, fpHits) = (fpRow.getLong(0), fpRow.getLong(1), fpRow.getLong(2))
    val (nProbes, nDupHits, nDupTop1) = Await.result(lshF, Duration.Inf)
    Seq(sigs, doubled, fps).foreach(ext.Dedup.release)
    Seq(
      ("fingerprint", nTxt, fpHits == nTxt, nFp == fpHits),
      ("lsh_topk", nProbes, nDupHits == nProbes, nDupTop1 == nProbes),
      ("simhash", nDocs, simPlanted == nDocs, n4 == n8 && nBoth == n4))
      .toDF("op", "n_ref", "recall_ok", "precision_ok")
      .orderBy("op")
  }
  private val Q49Duck =
    """WITH s5 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
      |d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM s5
      |      UNION ALL SELECT CAST(doc_id AS BIGINT) + 1000000, text FROM s5),
      |tp AS (SELECT count(*) AS n FROM d a JOIN d b
      |       ON a.text = b.text AND a.doc_id < b.doc_id),
      |pr AS (SELECT count(*) AS n FROM embeddings WHERE vec_id < 10)
      |SELECT 'fingerprint' AS op, (SELECT n FROM tp) AS n_ref,
      |       true AS recall_ok, true AS precision_ok
      |UNION ALL SELECT 'lsh_topk', (SELECT n FROM pr), true, true
      |UNION ALL SELECT 'simhash', (SELECT count(*) FROM s5), true, true
      |ORDER BY op""".stripMargin

  /** Q30 — S9 DDL: external table over an existing location
   *  (`delta/delta_scd_script.py:41` shape), then a catalog-table scan. */
  private def ddlQuery(s: SparkSession, dir: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS orders_ext")
    s.sql(s"CREATE TABLE orders_ext USING parquet LOCATION '$dir/orders.parquet'")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_ext
        |WHERE o_orderkey = 103 ORDER BY o_orderkey""".stripMargin)
  }

  /** Configure the graft DSv2 catalog once per session; returns its
   *  warehouse root (tables created directly at warehouse paths become
   *  addressable by catalog name). */
  private def ensureCatalog(s: SparkSession): String = {
    if (s.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      s.conf.set("spark.sql.catalog.graft", "graft.sql.GraftTableCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        trackedTempDir("graft-wh").toString)
      // V2 bucketing is part of the session contract, set once here (not
      // mid-query, which would leak a conf flip into unrelated plans):
      // bucket-clustered catalog tables plan storage-partitioned joins
      // whenever layouts align. SPJ never changes results — only removes
      // Exchanges — and Bench.scala saves/restores this conf around the
      // rows that measure SPJ-on vs SPJ-off explicitly.
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    }
    s.conf.get("spark.sql.catalog.graft.warehouse")
  }

  /** Q31 — S6 DSv2 catalog round-trip: writeTo createOrReplace into the
   *  graft TableCatalog, read back through SQL with a pushed-down filter
   *  (stats pruning behind the catalog scan). */
  private def catalogRoundTrip(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    s.table("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft.bench.orders_cat").createOrReplace()
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM graft.bench.orders_cat
        |WHERE o_orderkey = 103 ORDER BY o_orderkey""".stripMargin)
  }

  /** Q127 — STORAGE-PARTITIONED JOIN over co-bucketed catalog tables:
   *  orders and customer land identity-routed on `bucket(8, custkey)`
   *  (every file holds exactly one bucket; its id rides the manifest),
   *  the DSv2 scans report the layout as KeyGroupedPartitioning through
   *  the catalog's `bucket` function, and the fact-dim equi-join +
   *  group-by then align per-bucket partitions directly — the layout
   *  shuffle is paid ONCE at write time, the query pays none (the plan
   *  shape PlanSpec pins: zero Exchange under a forced sort-merge
   *  join). The declared result is correctness-gated against the plain
   *  join-aggregate oracle, so a bucket-routing error (a row in the
   *  wrong bucket file silently missing its join partner — the failure
   *  SPJ turns into wrong answers if the layout lies) fails the hash.
   *  Integer-floored sums keep the cross-engine aggregate exact. */
  private val spjBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def ensureSpjTables(s: SparkSession, dir: String): Unit =
    spjBuilt.getOrElseUpdate(dir, {
      s.table("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .writeTo("graft.bench.spj_orders")
        .partitionedBy(org.apache.spark.sql.functions.bucket(8, col("o_custkey")))
        .createOrReplace()
      s.table("customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .writeTo("graft.bench.spj_cust")
        .partitionedBy(org.apache.spark.sql.functions.bucket(8, col("c_custkey")))
        .createOrReplace()
      true
    })
  private def spjJoinQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjTables(s, dir)
    s.sql(
      """SELECT /*+ MERGE(o) */ c.c_custkey, c.c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_fl
        |FROM graft.bench.spj_orders o
        |JOIN graft.bench.spj_cust c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin)
  }
  private val Q127Duck =
    """SELECT c.c_custkey, c.c_mktsegment, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_fl
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_mktsegment
      |ORDER BY c.c_custkey""".stripMargin

  /** Q128 — COMPOSITE-KEY storage-partitioned join over the HYBRID
   *  layout `(bucket(8, custkey), month)`: the Iceberg fact-table
   *  pattern keyed on (entity, period). Each file holds exactly one
   *  (bucket, month) tuple — the writer's dynamic sub-partitioning —
   *  and the scan re-derives the month from exact file stats, so the
   *  two-column equi-join aligns per tuple with ZERO Exchange (a single
   *  multi-column bucket cannot convert on stock Spark; PlanSpec pins
   *  both facts). Correctness-gated against the plain join-aggregate
   *  oracle: a tuple-derivation error (a file claiming one month while
   *  holding two — join partners silently lost) fails the hash. */
  private val spjhBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def spjHybridQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjhTables(s, dir)
    s.sql(
      """SELECT /*+ MERGE(o) */ o.o_custkey, o.omonth,
        |  CAST(max(m.n_orders) AS BIGINT) AS n_orders,
        |  CAST(sum(o.price_fl) AS BIGINT) AS sum_price_fl
        |FROM graft.bench.spjh_orders o
        |JOIN graft.bench.spjh_month m
        |  ON o.o_custkey = m.o_custkey AND o.omonth = m.omonth
        |GROUP BY o.o_custkey, o.omonth
        |ORDER BY o.o_custkey, o.omonth""".stripMargin)
  }
  private def ensureSpjhTables(s: SparkSession, dir: String): Unit = {
    spjhBuilt.getOrElseUpdate(dir, ext.PhaseLog.timed("fixture_build") {
      s.sql("DROP TABLE IF EXISTS graft.bench.spjh_orders")
      s.sql("DROP TABLE IF EXISTS graft.bench.spjh_month")
      s.sql("CREATE TABLE graft.bench.spjh_orders " +
        "(o_custkey BIGINT, omonth INT, price_fl BIGINT) USING graft " +
        "PARTITIONED BY (bucket(8, o_custkey), omonth)")
      s.sql("CREATE TABLE graft.bench.spjh_month " +
        "(o_custkey BIGINT, omonth INT, n_orders BIGINT) USING graft " +
        "PARTITIONED BY (bucket(8, o_custkey), omonth)")
      s.table("orders")
        .select(col("o_custkey"),
          org.apache.spark.sql.functions.month(col("o_orderdate")).as("omonth"),
          org.apache.spark.sql.functions.floor(col("o_totalprice"))
            .cast("long").as("price_fl"))
        .writeTo("graft.bench.spjh_orders").append()
      s.table("orders")
        .groupBy(col("o_custkey"),
          org.apache.spark.sql.functions.month(col("o_orderdate")).as("omonth"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
        .writeTo("graft.bench.spjh_month").append()
      true
    })
    ()
  }
  private val Q128Duck =
    """WITH o AS (SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS omonth,
      |                  CAST(floor(o_totalprice) AS BIGINT) AS price_fl
      |           FROM orders),
      |m AS (SELECT o_custkey, omonth, count(*) AS n_orders FROM o GROUP BY 1, 2)
      |SELECT o.o_custkey, o.omonth,
      |       CAST(max(m.n_orders) AS BIGINT) AS n_orders,
      |       CAST(sum(o.price_fl) AS BIGINT) AS sum_price_fl
      |FROM o JOIN m ON o.o_custkey = m.o_custkey AND o.omonth = m.omonth
      |GROUP BY o.o_custkey, o.omonth
      |ORDER BY o.o_custkey, o.omonth""".stripMargin

  /** Q129 — DYNAMIC PARTITION PRUNING through the DSv2 scan: the fact
   *  table lands range-clustered on the join key (files carry disjoint
   *  custkey ranges — the prunable layout), the dim side is a parquet
   *  relation with a selective filter, and at EXECUTION the broadcast
   *  side's surviving join keys reach the fact scan as a runtime IN
   *  (`SupportsRuntimeV2Filtering`): whole manifest files drop before
   *  they are read, by stats-range + bloom key probes. At 100 TB this
   *  is the standing fact-dim join optimization — the dim filter is
   *  only known at run time, yet the fact side still reads a key-pruned
   *  slice instead of the full corpus. Correctness-gated against the
   *  plain join oracle: runtime pruning that drops a file it should
   *  have kept loses join rows and fails the hash. */
  private val dppBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def ensureDppOrders(s: SparkSession, dir: String): Unit =
    dppBuilt.getOrElseUpdate(dir, {
      s.table("orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartitionByRange(16, col("o_custkey"))
        .sortWithinPartitions(col("o_custkey"))
        .writeTo("graft.bench.dpp_orders").createOrReplace()
      true
    })
  private def dppJoinQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureDppOrders(s, dir)
    s.sql(
      """SELECT o.o_orderkey, o.o_custkey,
        |  CAST(floor(o.o_totalprice) AS BIGINT) AS price_fl
        |FROM graft.bench.dpp_orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal > 9900.0
        |ORDER BY o.o_orderkey""".stripMargin)
  }
  private val Q129Duck =
    """SELECT o.o_orderkey, o.o_custkey,
      |       CAST(floor(o.o_totalprice) AS BIGINT) AS price_fl
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_acctbal > 9900.0
      |ORDER BY o.o_orderkey""".stripMargin

  /** Q130 — TopN pushdown through the DSv2 scan: `ORDER BY key LIMIT n`
   *  over the key-clustered fact opens only the files that can hold the
   *  top n (the θ rule on exact manifest stats — walk bounded files by
   *  ascending max accumulating live rows to n; every file whose min
   *  exceeds that bound provably holds none of the answer). The 100 TB
   *  shape is the log-tail query: latest/earliest n of a time-clustered
   *  corpus for the cost of one or two files. Spark keeps the real
   *  sort+limit on top (partial pushdown), and the oracle is the same
   *  TopN over the plain table — a wrongly pruned file surfaces as a
   *  missing row and fails the hash. Tie-broken on o_orderkey so the
   *  selected rows are total-ordered and cross-engine deterministic. */
  private def topnQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureDppOrders(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_fl
        |FROM graft.bench.dpp_orders
        |ORDER BY o_custkey, o_orderkey LIMIT 100""".stripMargin)
  }
  private val Q130Duck =
    """SELECT o_orderkey, o_custkey,
      |       CAST(floor(o_totalprice) AS BIGINT) AS price_fl
      |FROM orders
      |ORDER BY o_custkey, o_orderkey LIMIT 100""".stripMargin

  /** Q131 — runtime filtering over the BUCKETED fact (q129's DPP with
   *  q127's layout — the composition a long-lived 100 TB fact actually
   *  runs): the broadcast dim's surviving keys reach the key-grouped
   *  scan at execution and files prune WITHIN their bucket groups, the
   *  distinct key set preserved by construction (a fully-pruned bucket
   *  executes as an empty partition). Declared against the plain join
   *  oracle: pruning that drops a file it should keep, or a group whose
   *  disappearance breaks the reported partitioning, loses rows and
   *  fails the hash. Reuses q127's co-bucketed `spj_orders` table. */
  private def dppBucketedQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjTables(s, dir)
    s.sql(
      """SELECT o.o_orderkey, o.o_custkey,
        |  CAST(floor(o.o_totalprice) AS BIGINT) AS price_fl
        |FROM graft.bench.spj_orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal > 9900.0
        |ORDER BY o.o_orderkey""".stripMargin)
  }
  private val Q131Duck =
    """SELECT o.o_orderkey, o.o_custkey,
      |       CAST(floor(o.o_totalprice) AS BIGINT) AS price_fl
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_acctbal > 9900.0
      |ORDER BY o.o_orderkey""".stripMargin

  /** Q132 — METADATA-ONLY GROUP BY (Iceberg's partitions-metadata-table
   *  query, served natively from the commit manifest): grouping q128's
   *  hybrid fact by its per-file single-valued partition column, the
   *  DSv2 aggregate pushdown answers one partial row per month from
   *  per-file row counts and exact stats — ZERO data files read
   *  (PlanSpec pins the GraftMetadataAgg plan with no ParquetScan, plus
   *  the refusals: a non-single-valued key or a pending DV falls back
   *  to the ordinary scan). Correctness-gated against the plain
   *  group-by oracle: a tuple mis-derived from stats, or a count that
   *  ignored a file, shifts a group's row and fails the hash. */
  private def metaGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjhTables(s, dir)
    s.sql(
      """SELECT omonth, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(max(price_fl) AS BIGINT) AS max_price_fl
        |FROM graft.bench.spjh_orders
        |GROUP BY omonth ORDER BY omonth""".stripMargin)
  }
  private val Q132Duck =
    """SELECT CAST(month(o_orderdate) AS INT) AS omonth,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(max(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS max_price_fl
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q133 — hybrid SPJ layout with a STRING identity sub-partition
   *  (`bucket(8, o_custkey), oprio` — the Iceberg `identity(string)`
   *  partition pattern, and the reference's own natural layout: its
   *  contact data partitions on `state`, `hudi/hudi_scd_script.py:24-28`).
   *  The scan proves each file's string partition value from
   *  WRITER-EXACT stats ([[graft.tables.SnapshotTable.ColStats]] `exact`
   *  — set only when our own writer's untruncated bounds are the
   *  verbatim values; parquet footer bounds from foreign writers may be
   *  truncated, which would let two different strings share a fabricated
   *  tuple, so unflagged files structurally un-report the layout). A
   *  co-partitioned fact-dim join on (custkey, oprio) then plans with
   *  ZERO Exchange — q128's composite-key SPJ dividend extended to the
   *  string domain. Correctness vs the plain join oracle: a row routed
   *  or tuple-derived wrongly misses its join partner and fails the
   *  hash; the exchange-free plan and the adopted-file refusal are
   *  PlanSpec-pinned. */
  private val spjsBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def ensureSpjsTables(s: SparkSession, dir: String): Unit = {
    spjsBuilt.getOrElseUpdate(dir, {
      s.sql("DROP TABLE IF EXISTS graft.bench.spjs_orders")
      s.sql("DROP TABLE IF EXISTS graft.bench.spjs_prio")
      s.sql("CREATE TABLE graft.bench.spjs_orders " +
        "(o_custkey BIGINT, oprio STRING, o_status STRING, price_fl BIGINT) USING graft " +
        "PARTITIONED BY (bucket(8, o_custkey), oprio)")
      s.sql("CREATE TABLE graft.bench.spjs_prio " +
        "(o_custkey BIGINT, oprio STRING, n_orders BIGINT) USING graft " +
        "PARTITIONED BY (bucket(8, o_custkey), oprio)")
      s.table("orders")
        .select(col("o_custkey"), col("o_orderpriority").as("oprio"),
          col("o_orderstatus").as("o_status"),
          org.apache.spark.sql.functions.floor(col("o_totalprice"))
            .cast("long").as("price_fl"))
        .writeTo("graft.bench.spjs_orders").append()
      s.table("orders")
        .groupBy(col("o_custkey"), col("o_orderpriority").as("oprio"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
        .writeTo("graft.bench.spjs_prio").append()
      true
    })
    ()
  }
  private def spjStringHybridQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjsTables(s, dir)
    s.sql(
      """SELECT /*+ MERGE(o) */ o.o_custkey, o.oprio,
        |  CAST(max(m.n_orders) AS BIGINT) AS n_orders,
        |  CAST(sum(o.price_fl) AS BIGINT) AS sum_price_fl
        |FROM graft.bench.spjs_orders o
        |JOIN graft.bench.spjs_prio m
        |  ON o.o_custkey = m.o_custkey AND o.oprio = m.oprio
        |GROUP BY o.o_custkey, o.oprio
        |ORDER BY o.o_custkey, o.oprio""".stripMargin)
  }
  private val Q133Duck =
    """WITH o AS (SELECT o_custkey, o_orderpriority AS oprio,
      |                  CAST(floor(o_totalprice) AS BIGINT) AS price_fl
      |           FROM orders),
      |m AS (SELECT o_custkey, oprio, count(*) AS n_orders FROM o GROUP BY 1, 2)
      |SELECT o.o_custkey, o.oprio,
      |       CAST(max(m.n_orders) AS BIGINT) AS n_orders,
      |       CAST(sum(o.price_fl) AS BIGINT) AS sum_price_fl
      |FROM o JOIN m ON o.o_custkey = m.o_custkey AND o.oprio = m.oprio
      |GROUP BY o.o_custkey, o.oprio
      |ORDER BY o.o_custkey, o.oprio""".stripMargin

  /** Q134 — METADATA-ONLY GROUP BY over a STRING partition column with
   *  STRING MIN/MAX (q132's manifest-served aggregation extended to the
   *  string domain by the writer-exact stats flag): grouping q133's
   *  hybrid fact by its per-file single-valued string key, the DSv2
   *  aggregate pushdown folds one partial row per priority from
   *  per-file row counts and exact bounds — ZERO data files read — and
   *  min/max over a SECOND string column (`o_status`) folds the
   *  exact-flagged bounds in UTF8String binary order (Spark's string
   *  ordering). Truncated or adopted bounds refuse (a truncated max
   *  understates, an incremented one overstates) and fall back to the
   *  ordinary scan — PlanSpec pins both the metadata plan and the
   *  refusal. Oracle replays the group-by from the plain table. */
  private def metaStringGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureSpjsTables(s, dir)
    s.sql(
      """SELECT oprio, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_status) AS min_status, max(o_status) AS max_status,
        |  CAST(max(price_fl) AS BIGINT) AS max_price_fl
        |FROM graft.bench.spjs_orders
        |GROUP BY oprio ORDER BY oprio""".stripMargin)
  }
  private val Q134Duck =
    """SELECT o_orderpriority AS oprio, CAST(count(*) AS BIGINT) AS n_rows,
      |       min(o_orderstatus) AS min_status, max(o_orderstatus) AS max_status,
      |       CAST(max(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS max_price_fl
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q135 — METADATA GROUP BY over a TIME TRANSFORM (Iceberg's
   *  partitions-metadata query grouped by the transform itself):
   *  `GROUP BY day(ts)` arrives at the DSv2 layer as
   *  `EXTRACT(DAY FROM CAST(ts AS date))` and is answered from the
   *  commit manifest when every file of the `days(ts)`-split layout
   *  proves its truncation constant (`fileTruncValue`: trunc(min) ==
   *  trunc(max) at the field's nailing granularity — equality of the
   *  extracts alone would NOT be sound, two Januaries of different
   *  years share MONTH=1). ZERO data files read; per-day counts and
   *  user-id bounds fold from per-file stats. The session-timezone gate
   *  (the cast is zone-dependent; only UTC matches the writer's split
   *  calendar) and the non-split-table refusal are PlanSpec-pinned.
   *  Oracle replays the group-by from the plain events table. */
  private val txfBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def ensureTxfEvents(s: SparkSession, dir: String): Unit = {
    txfBuilt.getOrElseUpdate(dir, {
      s.sql("DROP TABLE IF EXISTS graft.bench.txf_events")
      s.sql("CREATE TABLE graft.bench.txf_events " +
        "(event_id BIGINT, user_id BIGINT, ts TIMESTAMP) USING graft " +
        "PARTITIONED BY (bucket(8, user_id), days(ts))")
      s.table("events")
        .select(col("event_id"), col("user_id"), col("ts"))
        .writeTo("graft.bench.txf_events").append()
      true
    })
    ()
  }
  private def metaTimeGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxfEvents(s, dir)
    s.sql(
      """SELECT day(ts) AS d, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(user_id) AS BIGINT) AS min_user,
        |  CAST(max(user_id) AS BIGINT) AS max_user
        |FROM graft.bench.txf_events
        |GROUP BY day(ts) ORDER BY d""".stripMargin)
  }
  private val Q135Duck =
    """SELECT CAST(day(ts) AS INT) AS d, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(user_id) AS BIGINT) AS min_user,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q136 — the REFERENCE'S OWN contact pipeline over the round-13
   *  layouts (`hudi/hudi_scd_script.py` end-to-end on its natural data
   *  shape): the contact table is hudi-partitioned by `state`
   *  (partition-path = state, record key = id — here the hybrid
   *  `(bucket(4, id), state)` layout: record-key bucket routing plus
   *  per-state file splits carrying writer-exact string stats), loaded
   *  with the staged initial batch, merged via [[scd2.Scd2.hudiStyleMerge]]
   *  (stage → expire → union → keyed upsert, the reference's exact
   *  algorithm), then queried the way its analysts would: a GROUP BY
   *  `state` with string checksum bounds (metadata-only — answered from
   *  the manifest, zero data files), the golden current-rows count per
   *  state (ordinary scan), and a TopN over the string partition key
   *  (pushTopN file cap via writer-exact bounds). The oracle replays
   *  the whole SCD2 pipeline and all three legs in plain SQL. */
  private def contactPipelineQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val contacts = customer.select(
      col("c_custkey").cast("int").as("id"),
      col("c_name").as("name"),
      concat(col("c_name"), lit("@example.com")).as("email"),
      col("c_mktsegment").as("state"))
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-02-01 00:00:00")
    val initial = contacts.filter(col("id") % 3 =!= 0)
    val update = contacts.filter(col("id") % 5 === 0)
      .withColumn("email", concat(col("name"), lit("@new.example.com")))
    val tbl = s"q136c${math.abs(dir.hashCode).toString}"
    warmTable("q136", dir) {
      val root = trackedTempDir("graft_q136").toString + "/contact"
      val staged0 = graft.scd2.Scd2.stage(initial, t0)
      val t = SnapshotTable.createEmpty(s, root, staged0.schema,
        clusterBy = Seq("bucket(4, id)", "state"))
      t.append(staged0)
      graft.scd2.Scd2.hudiStyleMerge(t, update, t1, withCounts = false)
      s.sql(s"DROP TABLE IF EXISTS graft.extdb.$tbl")
      s.sql(s"CREATE TABLE graft.extdb.$tbl USING graft LOCATION '$root'")
      t
    }
    s.sql(
      s"""WITH g AS (
         |  SELECT state, CAST(count(*) AS BIGINT) AS n_rows,
         |         min(checksum) AS min_ck, max(checksum) AS max_ck
         |  FROM graft.extdb.$tbl GROUP BY state),
         |c AS (
         |  SELECT state, CAST(count(*) AS BIGINT) AS n_current
         |  FROM graft.extdb.$tbl WHERE iscurrent = 1 GROUP BY state),
         |t AS (SELECT state FROM
         |  (SELECT state, id FROM graft.extdb.$tbl ORDER BY state, id LIMIT 25)),
         |tc AS (SELECT state, CAST(count(*) AS BIGINT) AS n_top FROM t GROUP BY state)
         |SELECT g.state, g.n_rows, c.n_current, g.min_ck, g.max_ck,
         |       CAST(coalesce(tc.n_top, 0) AS BIGINT) AS n_top25
         |FROM g JOIN c ON g.state = c.state
         |LEFT JOIN tc ON g.state = tc.state
         |ORDER BY g.state""".stripMargin)
  }
  private val Q136Duck =
    """WITH contacts AS (
      |  SELECT CAST(c_custkey AS INT) AS id, c_name AS name,
      |         c_name || '@example.com' AS email, c_mktsegment AS state
      |  FROM customer),
      |initial AS (
      |  SELECT id, state, md5(name || email || state) AS checksum
      |  FROM contacts WHERE id % 3 <> 0),
      |upd AS (
      |  SELECT id, state,
      |         md5(name || name || '@new.example.com' || state) AS checksum
      |  FROM contacts WHERE id % 5 = 0),
      |final AS (
      |  SELECT id, state, checksum, 0 AS iscurrent
      |  FROM initial WHERE id % 5 = 0
      |  UNION ALL SELECT id, state, checksum, 1 FROM upd
      |  UNION ALL SELECT id, state, checksum, 1
      |  FROM initial WHERE id % 5 <> 0),
      |g AS (SELECT state, CAST(count(*) AS BIGINT) AS n_rows,
      |             min(checksum) AS min_ck, max(checksum) AS max_ck
      |      FROM final GROUP BY state),
      |c AS (SELECT state, CAST(count(*) AS BIGINT) AS n_current
      |      FROM final WHERE iscurrent = 1 GROUP BY state),
      |t AS (SELECT state FROM
      |      (SELECT state, id FROM final ORDER BY state, id LIMIT 25)),
      |tc AS (SELECT state, CAST(count(*) AS BIGINT) AS n_top FROM t GROUP BY state)
      |SELECT g.state, g.n_rows, c.n_current, g.min_ck, g.max_ck,
      |       CAST(coalesce(tc.n_top, 0) AS BIGINT) AS n_top25
      |FROM g JOIN c USING (state) LEFT JOIN tc USING (state)
      |ORDER BY g.state""".stripMargin

  /** Q137 — METADATA GROUP BY via `date_trunc`, the IDIOMATIC spelling
   *  (round 14 — closes the q135 family's usability gap): Spark never
   *  translates date_trunc to a V2 expression, so the DSv2 layer that
   *  serves q135's EXTRACT form cannot see this query; the
   *  [[sql.MetadataOnlyAgg]] grouped Catalyst case collapses it to a
   *  LocalRelation instead, under the same trunc-proof and UTC gates,
   *  including the display cast users wrap the key in (`CAST(… AS
   *  STRING)` — a deterministic function of the group key, evaluated
   *  per group on the driver). Same `days(ts)`-split events layout as
   *  q135, ZERO data files read (PlanSpec pins the LocalRelation
   *  collapse); oracle replays the group-by from the plain table. */
  private def metaTruncGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxfEvents(s, dir)
    s.sql(
      """SELECT CAST(date_trunc('DAY', ts) AS STRING) AS d,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(user_id) AS BIGINT) AS min_user,
        |  CAST(max(user_id) AS BIGINT) AS max_user
        |FROM graft.bench.txf_events
        |GROUP BY date_trunc('DAY', ts) ORDER BY d""".stripMargin)
  }
  private val Q137Duck =
    // DuckDB's date_trunc('day') yields DATE; cast through TIMESTAMP so
    // the string form matches Spark's "yyyy-MM-dd HH:mm:ss"
    """SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS d,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(user_id) AS BIGINT) AS min_user,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events GROUP BY date_trunc('day', ts) ORDER BY d""".stripMargin

  /** Q138 — the IDIOMATIC time filter as a declared query (round 14):
   *  `WHERE date_trunc('DAY', ts) = <day>` reaches NO pushdown layer in
   *  stock Spark (V2ExpressionBuilder translates neither date_trunc nor
   *  the date-cast comparison), so the natural "one day of data" query
   *  silently scans the corpus. [[sql.SargableTimePredicates]] rewrites
   *  it to `ts >= day AND ts < day+1` in the Filter — three-valued-logic
   *  equivalent, UTC-gated — which parquet row-group skipping, manifest
   *  stats pruning, and the `days(ts)` layout's file split all serve
   *  (PlanSpec pins the rewritten pushed range, the unaligned-literal
   *  empty range, the date-cast spelling, and the non-UTC refusal).
   *  Oracle replays the same predicate over the plain events table. */
  private def truncFilterQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxfEvents(s, dir)
    s.sql(
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(user_id) AS BIGINT) AS min_user,
        |  CAST(max(user_id) AS BIGINT) AS max_user
        |FROM graft.bench.txf_events
        |WHERE date_trunc('DAY', ts) = TIMESTAMP'2024-01-12 00:00:00'""".stripMargin)
  }
  private val Q138Duck =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(user_id) AS BIGINT) AS min_user,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events
      |WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-12 00:00:00'""".stripMargin

  /** Q139 — the CANONICAL reporting shape, metadata-only (round 15 —
   *  VERDICT r14 Next #1): `GROUP BY event_type, date_trunc('MONTH',
   *  ts)` — mixed identity + time group keys in the idiomatic
   *  date_trunc spelling. The DSv2 aggregate pushdown serves mixed
   *  identity+EXTRACT keys but never sees date_trunc
   *  (V2ExpressionBuilder does not translate it); the
   *  [[sql.MetadataOnlyAgg]] grouped case now accepts identity keys
   *  proved per-file single-valued ([[graft.tables.SnapshotTable
   *  .fileSingleValue]] — exact stats, min == max, zero nulls;
   *  writer-exact string bounds qualify) alongside trunc keys, so the
   *  whole query collapses to a LocalRelation: one row per
   *  (event_type, month), ZERO data files read (PlanSpec pins the
   *  collapse and the refusal fallbacks). Layout: the hybrid
   *  `(bucket(8, user_id), event_type, months(ts))` spec — the writer's
   *  dynamic sub-partition split puts exactly one (event_type, month)
   *  pair per file, the same invariant q136's per-state files prove.
   *  Oracle replays the group-by from the plain events table. */
  private val txmBuilt = scala.collection.concurrent.TrieMap[String, Boolean]()
  private def ensureTxmEvents(s: SparkSession, dir: String): Unit = {
    txmBuilt.getOrElseUpdate(dir, {
      s.sql("DROP TABLE IF EXISTS graft.bench.txm_events")
      s.sql("CREATE TABLE graft.bench.txm_events " +
        "(event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, " +
        "props STRING, note STRING) USING graft " +
        "PARTITIONED BY (bucket(8, user_id), event_type, months(ts))")
      s.table("events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          col("props"),
          // a NULLABLE payload so count(note) exercises rows − nullCount
          when(col("value") > 15.0, col("props")).as("note"))
        .writeTo("graft.bench.txm_events").append()
      true
    })
    ()
  }
  private def metaMixedGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxmEvents(s, dir)
    s.sql(
      """SELECT event_type, CAST(date_trunc('MONTH', ts) AS STRING) AS m,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(user_id) AS BIGINT) AS min_user,
        |  CAST(max(user_id) AS BIGINT) AS max_user
        |FROM graft.bench.txm_events
        |GROUP BY event_type, date_trunc('MONTH', ts)
        |ORDER BY event_type, m""".stripMargin)
  }
  private val Q139Duck =
    """SELECT event_type,
      |       CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS VARCHAR) AS m,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(user_id) AS BIGINT) AS min_user,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q141 — the FULL reporting mix, metadata-only (round 15): mixed
   *  identity + date_trunc group keys with `count(*)`, NULL-aware
   *  `count(note)` (= Σ rows − nullCount per group, the DSv2 layer's
   *  rule now served by the Catalyst collapse too), and STRING
   *  min/max over writer-exact bounds (q134's rule extended to the
   *  grouped/filtered Catalyst serves — unflagged string bounds may be
   *  truncated and refuse). ZERO data files read; oracle replays the
   *  whole mix, deriving `note` from the plain events table. */
  private def metaMixAggQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxmEvents(s, dir)
    s.sql(
      """SELECT event_type, CAST(date_trunc('MONTH', ts) AS STRING) AS m,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(note) AS BIGINT) AS n_notes,
        |  min(props) AS min_props, max(props) AS max_props
        |FROM graft.bench.txm_events
        |GROUP BY event_type, date_trunc('MONTH', ts)
        |ORDER BY event_type, m""".stripMargin)
  }
  private val Q141Duck =
    """SELECT event_type,
      |       CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS VARCHAR) AS m,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(CASE WHEN value > 15.0 THEN props END) AS BIGINT) AS n_notes,
      |       min(props) AS min_props, max(props) AS max_props
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q140 — the TIME-BOUNDED daily report, metadata-only (round 15):
   *  `WHERE date_trunc('DAY', ts) >= A AND date_trunc('DAY', ts) < B
   *  GROUP BY date_trunc('DAY', ts)` — "daily counts for one week", the
   *  canonical dashboard query, served with ZERO data files read. Two
   *  round-15 pieces compose inside one optimizer fixed-point:
   *  [[sql.SargableTimePredicates]] rewrites the idiomatic trunc
   *  filter to raw `ts` ranges, then [[sql.MetadataOnlyAgg]]'s grouped
   *  case accepts the Filter because every live file of the `days(ts)`
   *  layout provably passes or fails it WHOLE (bounds inside the
   *  range, zero nulls — one possibly-straddling file refuses to the
   *  ordinary scan). The group-by then folds only the accepted files.
   *  Oracle replays filter + group-by over the plain events table. */
  private def metaFilteredGroupByQuery(s: SparkSession, dir: String): DataFrame = {
    ensureCatalog(s)
    registerViews(s, dir)
    ensureTxfEvents(s, dir)
    s.sql(
      """SELECT CAST(date_trunc('DAY', ts) AS STRING) AS d,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(user_id) AS BIGINT) AS min_user,
        |  CAST(max(user_id) AS BIGINT) AS max_user
        |FROM graft.bench.txf_events
        |WHERE date_trunc('DAY', ts) >= TIMESTAMP'2024-01-08 00:00:00'
        |  AND date_trunc('DAY', ts) < TIMESTAMP'2024-01-15 00:00:00'
        |GROUP BY date_trunc('DAY', ts) ORDER BY d""".stripMargin)
  }
  private val Q140Duck =
    """SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS d,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(user_id) AS BIGINT) AS min_user,
      |       CAST(max(user_id) AS BIGINT) AS max_user
      |FROM events
      |WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND date_trunc('day', ts) < TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q32 — as-of join: each click matched to the user's most recent view
   *  (point-in-time correctness; DuckDB's native ASOF JOIN as oracle). */
  private def asofQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ev = s.table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    graft.ops.AsOfJoin.asof(clicks, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("view_id"))
      .orderBy("event_id")
  }
  private val Q32Duck =
    """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |views AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view')
      |SELECT c.event_id, v.view_id FROM clicks c
      |ASOF LEFT JOIN views v ON c.user_id = v.user_id AND v.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** Q33 — range join: clicks within 1 hour after each signup, binned
   *  equi-join on (user, time-bin); oracle is the plain inequality join. */
  private def rangeQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    val ev = s.table("events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 1 HOUR")).as("e_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    graft.ops.RangeJoin.intervalPointJoin(
        signups, clicks, Seq("user_id"), "s_ts", "e_ts", "ts",
        binWidth = 3600L * 1000000, asLong = unix_micros(_))
      .select(col("signup_id"), col("click_id"))
      .orderBy("signup_id", "click_id")
  }
  private val Q33Duck =
    """WITH signups AS (SELECT event_id AS signup_id, user_id, ts FROM events WHERE event_type = 'signup'),
      |clicks AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT s.signup_id, c.click_id FROM signups s JOIN clicks c
      |ON s.user_id = c.user_id AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 1 HOUR
      |ORDER BY s.signup_id, c.click_id""".stripMargin

  /** Q34 — ROLLUP grouping sets (aggregation-closure widening); sum
   *  rounds through DOUBLE for hasher-identical rendering (q36 pattern). */
  private val Q34 =
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q35 — INTERSECT / EXCEPT set operations. */
  private val Q35 =
    """WITH i AS (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier),
      |e AS (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier)
      |SELECT 'i' AS op, k FROM i UNION ALL SELECT 'e' AS op, k FROM e ORDER BY op, k""".stripMargin

  /** Q36 — ordered-set aggregate (continuous percentile), identical
   *  linear-interpolation semantics in both engines. */
  private val Q36 =
    """SELECT l_returnflag,
      |  round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 6) AS med_qty,
      |  round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 6) AS p90_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q37 — pivot: DataFrame `groupBy().pivot()` on the Spark side, the
   *  equivalent conditional aggregation as the portable oracle. */
  private def pivotQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.table("events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").cast("long"),
        col("view").cast("long"), col("purchase").cast("long"))
      .orderBy("user_id")
  }
  private val Q37Duck =
    """SELECT user_id,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q38 — gaps-and-islands sessionization (LAG + running-sum windows):
   *  30-minute-gap sessions per user; outputs engine-independent session
   *  ordinals and event counts (raw timestamps would differ in sub-ms
   *  digits between the micros view and DuckDB's nanos). */
  private val Q38 =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              > INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  /** Q39 — CUBE with GROUPING() markers (full grouping-sets closure). */
  private val Q39 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q40 — raw event timestamps through the nanos→micros view (declarable
   *  only with integer division in [[registerViews]]; the fixture's
   *  timestamps are whole micros, so the micros view and DuckDB's
   *  nanos agree exactly). */
  private val Q40Spark =
    """SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  private val Q40Duck =
    """SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS first_ts,
      |  CAST(max(ts) AS TIMESTAMP) AS last_ts,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------------
  // Q41 — the full Hudi-script SCD2 pipeline (S5 keyed upsert + precombine)
  // through the REAL table layer: initial load, staged batch,
  // Scd2.hudiStyleMerge → SnapshotTable.upsert on (id, checksum). The
  // oracle re-derives the final table in pure SQL: every staged row ends
  // current (matched rows refreshed, new rows inserted), changed initial
  // rows survive as expired versions.
  // ------------------------------------------------------------------------

  private def hudiUpsertResult(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    def contacts(seg: Column) = Seq(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").cast("string").as("email"), seg.as("state"))
    val initial = customer.filter(col("c_custkey") % 3 =!= 0)
      .select(contacts(col("c_mktsegment")): _*)
    val staged = customer.select(contacts(
      when(col("c_custkey") % 5 === 0, upper(col("c_mktsegment")))
        .otherwise(col("c_mktsegment"))): _*)
    val table = warmTable("q41", dir)(graft.scd2.Scd2.initialLoad(s,
      trackedTempDir("graft_q41").toString, initial,
      Timestamp.valueOf("2024-01-01 00:00:00")))
    graft.scd2.Scd2.hudiStyleMerge(table, staged,
      Timestamp.valueOf("2024-02-01 00:00:00"), withCounts = false)
    table.read().select(col("id"), col("iscurrent"), col("checksum"))
      .orderBy("id", "iscurrent", "checksum")
  }

  private val Q41Duck =
    """WITH initial AS (
      |  SELECT c_custkey AS id, md5(concat(c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS checksum
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |delta AS (
      |  SELECT c_custkey AS id,
      |         md5(concat(c_name, CAST(c_nationkey AS VARCHAR),
      |           CASE WHEN c_custkey % 5 = 0 THEN upper(c_mktsegment) ELSE c_mktsegment END)) AS checksum
      |  FROM customer),
      |expired AS (
      |  SELECT i.id, i.checksum FROM initial i
      |  JOIN delta d ON i.id = d.id AND i.checksum <> d.checksum)
      |SELECT id, 1 AS iscurrent, checksum FROM delta
      |UNION ALL SELECT id, 0 AS iscurrent, checksum FROM expired
      |ORDER BY id, iscurrent, checksum""".stripMargin

  // ------------------------------------------------------------------------
  // Q42 — merge-on-read real-time view: base snapshot + two deferred
  // upsert batches (no base rewrite), read through the merged RT view.
  // Batch 2 (%7 keys) overrides batch 1 (%5 keys) overrides base —
  // latest-wins per record key, which the oracle replays as a CASE.
  // ------------------------------------------------------------------------

  private def morReadResult(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    def shape(bump: Column, ver: Int) = Seq(
      col("c_custkey").as("id"),
      (col("c_acctbal") + bump).as("bal"),
      lit(ver.toLong).as("ver"))
    // the deferred-upsert deltas are part of the table SETUP here; the
    // measured operation is the merge-on-read real-time read
    val table = warmTable("q42", dir) {
      val t = SnapshotTable.create(s,
        trackedTempDir("graft_q42").toString,
        customer.select(shape(lit(0), 0): _*))
      t.upsertDeferred(
        customer.filter(col("c_custkey") % 5 === 0).select(shape(lit(100), 1): _*),
        keys = Seq("id"), precombine = "ver")
      t.upsertDeferred(
        customer.filter(col("c_custkey") % 7 === 0).select(shape(lit(200), 2): _*),
        keys = Seq("id"), precombine = "ver")
      t
    }
    table.read()
      .select(col("id"), col("ver"), round(col("bal"), 2).as("bal"))
      .orderBy("id")
  }

  private val Q42Duck =
    """SELECT c_custkey AS id,
      |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 2
      |            WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ver,
      |  round(c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 200
      |                         WHEN c_custkey % 5 = 0 THEN 100 ELSE 0 END, 2) AS bal
      |FROM customer ORDER BY id""".stripMargin

  /** Q101 — MoR `_ro`/`_rt` SQL faces (Hudi hive-sync parity,
   *  `README.md:158`, `hudi/hudi_scd_script.py:35-40`): the q42-shape
   *  MoR table addressed by NAME through the DSv2 catalog — `t_ro`
   *  serves the base files (the pending %5 upsert batch invisible, the
   *  read-optimized contract), `t_rt` the merged real-time view — and
   *  the oracle replays both faces from the customer table. */
  private def morFacesQuery(s: SparkSession, dir: String): DataFrame = {
    val wh = ensureCatalog(s)
    val customer = s.read.parquet(s"$dir/customer.parquet")
    def shape(bump: Column, ver: Int) = Seq(
      col("c_custkey").as("id"),
      (col("c_acctbal") + bump).as("bal"),
      lit(ver.toLong).as("ver"))
    // per-dir table name: warmTable caches per (key, dir), so two scale
    // dirs in one session must not share one physical catalog table
    val tbl = s"q101mor${math.abs(dir.hashCode).toString}"
    warmTable("q101", dir) {
      val t = SnapshotTable.create(s, s"$wh/bench/$tbl",
        customer.select(shape(lit(0), 0): _*))
      t.upsertDeferred(
        customer.filter(col("c_custkey") % 5 === 0).select(shape(lit(100), 1): _*),
        keys = Seq("id"), precombine = "ver")
      t
    }
    s.sql(
      s"""SELECT 'ro' AS face, id, ver, round(bal, 2) AS bal
         |FROM graft.bench.${tbl}_ro
         |UNION ALL
         |SELECT 'rt' AS face, id, ver, round(bal, 2) AS bal
         |FROM graft.bench.${tbl}_rt
         |ORDER BY face, id""".stripMargin)
  }
  private val Q101Duck =
    """SELECT 'ro' AS face, c_custkey AS id, CAST(0 AS BIGINT) AS ver,
      |  round(c_acctbal, 2) AS bal
      |FROM customer
      |UNION ALL
      |SELECT 'rt' AS face, c_custkey AS id,
      |  CAST(CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ver,
      |  round(c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 100 ELSE 0 END, 2) AS bal
      |FROM customer
      |ORDER BY face, id""".stripMargin

  /** Q113 — CROSS-SESSION catalog persistence ([[sql.CatalogRegistry]];
   *  the reference's hive-sync/Glue role, `hudi/hudi_scd_script.py:
   *  35-40`): an EXTERNAL-location table is registered by name through
   *  `CREATE TABLE … LOCATION`, and the declared read runs from a
   *  freshly built session (`newSession()` — a new SessionState whose
   *  catalogs re-instantiate from conf, so the ONLY channel to the
   *  reader is the warehouse's on-disk registry, the same bytes a new
   *  JVM would read). A registration that silently stayed session-local
   *  would fail resolution here and error the query. Oracle = the base
   *  table (the external root holds an unmodified copy). */
  private def catalogPersistenceQuery(s: SparkSession, dir: String): DataFrame = {
    val wh = ensureCatalog(s)
    val tbl = s"q113ext${math.abs(dir.hashCode).toString}"
    warmTable("q113", dir) {
      val root = trackedTempDir("graft_q113").toString + "/nation_ext"
      val t = SnapshotTable.create(s, root, s.read.parquet(s"$dir/nation.parquet"))
      s.sql(s"DROP TABLE IF EXISTS graft.extdb.$tbl")
      s.sql(s"CREATE TABLE graft.extdb.$tbl USING graft LOCATION '$root'")
      t
    }
    val s2 = s.newSession()
    // a new job's session config: same catalog conf, nothing else carried
    s2.conf.set("spark.sql.catalog.graft", "graft.sql.GraftTableCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql(
      s"""SELECT n_nationkey, n_name, n_regionkey
         |FROM graft.extdb.$tbl ORDER BY n_nationkey""".stripMargin)
  }
  private val Q113Duck =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ------------------------------------------------------------------------
  // Q64 — MoR deferred DELETES mixed with deferred upserts (Hudi delete
  // log-block semantics): base + upsert batch (%5 bump) + delete batch
  // (%7=3 tombstones) + resurrecting upsert batch (%14=3 returns with a
  // later version). No base rewrite anywhere in the setup; the measured
  // operation is the real-time read resolving all three delta batches in
  // arrival order, which the oracle replays as CASE + WHERE.
  // ------------------------------------------------------------------------

  private def morDeleteResult(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    def shape(bump: Column, ver: Int) = Seq(
      col("c_custkey").as("id"),
      (col("c_acctbal") + bump).as("bal"),
      lit(ver.toLong).as("ver"))
    val table = warmTable("q64", dir) {
      val t = SnapshotTable.create(s,
        trackedTempDir("graft_q64").toString,
        customer.select(shape(lit(0), 0): _*))
      t.upsertDeferred(
        customer.filter(col("c_custkey") % 5 === 0).select(shape(lit(100), 1): _*),
        keys = Seq("id"), precombine = "ver")
      t.deleteDeferred(col("id") % 7 === 3, keys = Seq("id"), precombine = "ver")
      t.upsertDeferred(
        customer.filter(col("c_custkey") % 14 === 3).select(shape(lit(300), 3): _*),
        keys = Seq("id"), precombine = "ver")
      t
    }
    table.read()
      .select(col("id"), col("ver"), round(col("bal"), 2).as("bal"))
      .orderBy("id")
  }

  private val Q64Duck =
    """SELECT c_custkey AS id,
      |  CAST(CASE WHEN c_custkey % 14 = 3 THEN 3
      |            WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ver,
      |  round(c_acctbal + CASE WHEN c_custkey % 14 = 3 THEN 300
      |                         WHEN c_custkey % 5 = 0 THEN 100 ELSE 0 END, 2) AS bal
      |FROM customer
      |WHERE c_custkey % 7 <> 3 OR c_custkey % 14 = 3
      |ORDER BY id""".stripMargin

  /** Q55 — change data feed ([[SnapshotTable.readChanges]], the Delta CDF
   *  / Hudi incremental-changes surface): deterministic update + delete on
   *  a customer-derived table, then the keyed row-level diff of versions
   *  (0, 2]. The oracle replays both mutations in SQL; carried rows of the
   *  CoW rewrites must cancel (only logically-changed rows may appear).
   *  On warm (restored) tables the mutations land as higher versions but
   *  re-produce bit-identical v1/v2 change entries, so the (0, 2] window
   *  is rep-stable. */
  private def cdfQuery(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val table = warmTable("q55", dir)(SnapshotTable.create(s,
      trackedTempDir("graft_q55").toString,
      customer.select(col("c_custkey").as("id"), col("c_mktsegment").as("state"))
        .repartitionByRange(4, col("id"))))
    table.update(col("id") % 5 === 0, Map("state" -> lower(col("state")))) // v1
    table.delete(col("id") % 7 === 3)                                      // v2
    table.readChanges(0, 2, keyCols = Seq("id"))
      .select(col("id"), col("state"), col("_change_type"), col("_commit_version"))
      .orderBy("id", "_change_type")
  }
  private val Q55Duck =
    """WITH base AS (SELECT c_custkey AS id, c_mktsegment AS state FROM customer),
      |upd AS (SELECT id, state FROM base WHERE id % 5 = 0),
      |s1 AS (SELECT id, CASE WHEN id % 5 = 0 THEN lower(state) ELSE state END AS state
      |       FROM base),
      |del AS (SELECT id, state FROM s1 WHERE id % 7 = 3)
      |SELECT id, state, _change_type, _commit_version FROM (
      |  SELECT id, state, 'update_preimage' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version FROM upd
      |  UNION ALL
      |  SELECT id, lower(state), 'update_postimage', 1 FROM upd
      |  UNION ALL
      |  SELECT id, state, 'delete', 2 FROM del)
      |ORDER BY id, _change_type""".stripMargin

  /** Q115 — CDF CONSUMER ([[SnapshotTable.applyChanges]], the downstream
   *  mirror-materialization half of the change-data-capture surface; q55
   *  declares the feed side): a source table takes q55's deterministic
   *  update (v1) + delete (v2), and a mirror bootstrapped from the v0
   *  snapshot replays the feed through `applyChanges` — TWICE, with
   *  OVERLAPPING windows ((0,1] then (0,2]) so the declared result also
   *  exercises the latest-change-per-key reduction's idempotence: the v1
   *  updates arrive in both windows and must converge, the v2 delete must
   *  win over the overlapping v1 update for keys in both classes. The
   *  measured read is the MIRROR, which the oracle replays by applying
   *  the mutations directly to the base table. */
  private def applyChangesQuery(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val base = customer.select(col("c_custkey").as("id"),
      col("c_mktsegment").as("state"), col("c_acctbal").as("bal"))
    val src = warmTable("q115src", dir)(SnapshotTable.create(s,
      trackedTempDir("graft_q115s").toString,
      base.repartitionByRange(4, col("id"))))
    val mirror = warmTable("q115mir", dir)(SnapshotTable.create(s,
      trackedTempDir("graft_q115m").toString,
      base.repartitionByRange(4, col("id"))))
    ext.PhaseLog.timed("update")(
      src.update(col("id") % 5 === 0, Map("state" -> lower(col("state"))))) // v1
    ext.PhaseLog.timed("delete")(src.delete(col("id") % 7 === 3))           // v2
    // overlapping replay windows: (0,1] then (0,2] — the second window
    // re-delivers every v1 change the first already applied
    ext.PhaseLog.timed("apply_changes")(
      mirror.applyChanges(src.readChanges(0, 1, keyCols = Seq("id")), Seq("id")))
    ext.PhaseLog.timed("apply_changes")(
      mirror.applyChanges(src.readChanges(0, 2, keyCols = Seq("id")), Seq("id")))
    mirror.read()
      .select(col("id"), col("state"), round(col("bal"), 2).as("bal"))
      .orderBy("id")
  }
  private val Q115Duck =
    """WITH base AS (SELECT c_custkey AS id, c_mktsegment AS state,
      |                     c_acctbal AS bal FROM customer),
      |s1 AS (SELECT id, CASE WHEN id % 5 = 0 THEN lower(state) ELSE state END AS state,
      |              bal FROM base)
      |SELECT id, state, round(bal, 2) AS bal FROM s1
      |WHERE id % 7 <> 3 ORDER BY id""".stripMargin

  /** Q116 — perceptual-hash IMAGE near-dup ([[ext.Dedup.imageNearDupPairs]]
   *  — the multimodal decode→dedup closure): per doc_id a 9×8 PNG is
   *  synthesized with per-PIXEL grays from id arithmetic (q27's
   *  planted-ground-truth technique at pixel granularity), REALLY decoded
   *  through `javax.imageio`, dHashed over the decoded luminance grid,
   *  and near-dup-mined by the banded pigeonhole join. Docs with
   *  id % 100 == 99 plant a copy of id−1 with ONE pixel brightened by
   *  128 — flipping at most two ADJACENT gradient bits (one grid row),
   *  so every planted pair sits at Hamming ≤ 2 with three of four chunk
   *  bands intact: banding MUST recover it (`planted_found`, the
   *  structural recall gate). The hash itself is proven bit-for-bit: the
   *  oracle replays all four 16-bit bands from the generating arithmetic
   *  — 64 grid comparisons as pure SQL — so a decode or hash deviation
   *  fails the value hash, not just the recall flag. */
  private def perceptualHashQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val assets = docs.repartition(s.sparkContext.defaultParallelism) // q27 note
      .as[Long].mapPartitions { it =>
      it.map { id =>
        val isCopy = id % 100 == 99
        val base = if (isCopy) id - 1 else id
        val v = (base * 48271 + 11) % 65536
        val u = (base * 69621 + 7) % 65536
        val px = (id % 9).toInt
        val py = ((id * 3) % 8).toInt
        val png = ext.Multimodal.encodePngPixels(9, 8, (x, y) => {
          val p = if (isCopy && x == px && y == py) 128L else 0L
          ((v * (x + 3) + u * (y + 1) * (x + 1) + p) % 256).toInt
        })
        (id, png)
      }
    }.toDF("asset_id", "media")
    // decode+hash once (the dominant pass): the signature frame feeds the
    // pair miner's two join sides AND the band projection below
    val sigs = ext.Multimodal.imageDHashes(assets).localCheckpoint()
    val pairs = ext.Dedup.simhashPairsFromSignatures(
      sigs, "asset_id", "dhash", maxHamming = 3, chunks = 4)
    val found = pairs
      .filter(col("id_a") % 100 === 98 && col("id_b") === col("id_a") + 1)
      .select(col("id_a").as("asset_id"), lit(true).as("f"))
    sigs.join(found, Seq("asset_id"), "left")
      .select(col("asset_id") +:
        (0 until 4).map(k => shiftright(col("dhash"), 16 * k)
          .bitwiseAND(lit(0xFFFFL)).as(s"b$k")) :+
        (coalesce(col("f"), lit(false)) ||
          col("asset_id") % 100 =!= 98 || col("asset_id") === maxId)
          .as("planted_found"): _*)
      .orderBy("asset_id")
  }
  private val Q116Duck: String = {
    // pixel gray g(x,y) and the 64 dHash grid comparisons, inlined as
    // pure arithmetic — generated, not handwritten, so Spark's encoder
    // and the oracle share one formula by construction
    def g(x: Int, y: Int): String =
      s"((v*${x + 3} + u*${(y + 1) * (x + 1)} + " +
        s"CASE WHEN ic AND px=$x AND py=$y THEN 128 ELSE 0 END) % 256)"
    val bands = (0 until 4).map { k =>
      val terms = (for {
        y <- Seq(2 * k, 2 * k + 1)
        x <- 0 until 8
      } yield s"(CASE WHEN ${g(x, y)} < ${g(x + 1, y)} " +
        s"THEN ${1L << (y * 8 + x - 16 * k)} ELSE 0 END)").mkString(" + ")
      s"CAST($terms AS BIGINT) AS b$k"
    }.mkString(",\n  ")
    s"""WITH p AS (
       |  SELECT doc_id AS asset_id,
       |    CASE WHEN doc_id % 100 = 99 THEN doc_id - 1 ELSE doc_id END AS base,
       |    (doc_id % 100 = 99) AS ic,
       |    doc_id % 9 AS px, (doc_id * 3) % 8 AS py
       |  FROM documents),
       |w AS (SELECT asset_id, (base*48271 + 11) % 65536 AS v,
       |             (base*69621 + 7) % 65536 AS u, ic, px, py FROM p)
       |SELECT asset_id,
       |  $bands,
       |  true AS planted_found
       |FROM w ORDER BY asset_id""".stripMargin
  }

  /** Q56 — heavy-hitter domain capping ([[ext.Sampling.capPerGroup]]):
   *  keep the best `cap` documents per source, ranked by the q46 quality
   *  score (doc_id tie-break), via the two-phase salted top-k (no single
   *  reducer ever sees a whole hot domain). The oracle is the plain
   *  single-window rank — the two-phase plan must select exactly the
   *  same rows. */
  private def capPerSourceQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .withColumn("quality", ext.TextAnalysis.qualityScore(col("text")))
    ext.Sampling.capPerGroup(docs, "source",
        Seq(col("quality").desc, col("doc_id").asc), n = 15)
      .select(col("source"), col("doc_id"), col("quality"))
      .orderBy("source", "doc_id")
  }
  private val Q56Duck =
    """WITH q AS (
      |  SELECT source, doc_id, round(
      |    (len(list_distinct(string_split(text,' ')))*1.0 / len(string_split(text,' ')))
      |    * (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1.0
      |            ELSE len(string_split(text,' '))/10.0 END)
      |    * (CASE WHEN length(replace(text,' ',''))*1.0/len(string_split(text,' '))
      |                 BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn FROM q)
      |SELECT source, doc_id, quality FROM r WHERE rn <= 15
      |ORDER BY source, doc_id""".stripMargin

  /** Q57 — greedy sequence packing ([[ext.Packing.packGreedy]]): pack
   *  documents into 256-token context windows, sharded by doc_id % 8 so
   *  each shard packs independently (the scale unit). The oracle replays
   *  the sequential first-fit recurrence as a recursive CTE — the
   *  distributed shard-ordered mapPartitions must reproduce it exactly,
   *  bin ids, offsets and all. */
  private def packQuery(s: SparkSession, dir: String): DataFrame =
    ext.Packing.packGreedy(
        s.read.parquet(s"$dir/documents.parquet"),
        col("doc_id") % 8, col("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")), capacity = 256)
      .select(col("shard"), col("id").as("doc_id"), col("n_tokens"),
        col("bin_id"), col("bin_offset"))
      .orderBy("shard", "doc_id")
  private val Q57Duck =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id % 8 AS shard, doc_id,
      |         CAST(len(string_split(text,' ')) AS INT) AS n_tokens
      |  FROM documents),
      |s AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |      FROM t),
      |p AS (
      |  SELECT shard, doc_id, n_tokens, rn, 0 AS bin_id, n_tokens AS fill
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.shard, s.doc_id, s.n_tokens, s.rn,
      |         CASE WHEN p.fill + s.n_tokens > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
      |         CASE WHEN p.fill + s.n_tokens > 256 THEN s.n_tokens
      |              ELSE p.fill + s.n_tokens END
      |  FROM p JOIN s ON s.shard = p.shard AND s.rn = p.rn + 1)
      |SELECT shard, doc_id, n_tokens, bin_id, fill - n_tokens AS bin_offset
      |FROM p ORDER BY shard, doc_id""".stripMargin

  /** Q58 — KMV distinct-count sketch ([[ext.functions.kmvDistinct]], a
   *  mergeable TypedImperativeAggregate): distinct parts and suppliers
   *  per return flag with k-bounded state. k = 65536 exceeds every
   *  group's true distinct count at any driver SF, so the sketch is in
   *  its exact regime and `count(DISTINCT)` is a precise oracle; the
   *  estimator regime (error ≈ 1/√k) is covered by `ExtSpec`. */
  private def kmvQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(ext.functions.kmvDistinct(col("l_partkey"), 65536).as("nd_parts"),
        ext.functions.kmvDistinct(col("l_suppkey"), 65536).as("nd_supps"))
      .orderBy("l_returnflag")
  private val Q58Duck =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
      |       count(DISTINCT l_suppkey) AS nd_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q95 — persistable sketch states ([[ext.functions.kmvState]] /
   *  [[ext.functions.kmvMerge]], the pre-aggregated-cube flow of
   *  Agarwal et al.'s mergeable summaries): per-source distinct-token
   *  counts built INCREMENTALLY — half the corpus sketches into binary
   *  KMV states stored in a snapshot table (once per scale dir), the
   *  other half sketches fresh at query time, and the serve step merges
   *  stored ∪ fresh states. Because a KMV state is a pure function of
   *  the input set, store-then-merge is bit-identical to one full-corpus
   *  pass — and in the exact regime (k = 65536 > any source's
   *  vocabulary) the oracle is a plain `count(DISTINCT token)` over the
   *  WHOLE corpus: stale stored states, a missed batch, or a broken
   *  merge all shift the counts and fail the hash. */
  private def sketchCubeQuery(s: SparkSession, dir: String): DataFrame = {
    def toks(half: Int) = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 2 === half)
      .select(col("source"), explode(ext.TextAnalysis.tokens(col("text"))).as("token"))
    val store = warmTable("sketch_cube", dir) {
      SnapshotTable.create(s,
        trackedTempDir("graft_sketch_cube").toString,
        toks(0).groupBy("source")
          .agg(ext.functions.kmvState(col("token"), 65536).as("state")))
    }
    val fresh = toks(1).groupBy("source")
      .agg(ext.functions.kmvState(col("token"), 65536).as("state"))
    store.read().unionByName(fresh)
      .groupBy("source")
      .agg(ext.functions.kmvMerge(col("state"), 65536).as("nd_tokens"))
      .orderBy("source")
  }
  private val Q95Duck =
    """SELECT source, count(DISTINCT token) AS nd_tokens
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Q109 — mergeable quantile sketch ([[ext.functions.quantileState]] /
   *  [[ext.functions.quantileMerge]], the KLL compactor completing the
   *  sketch family next to KMV/SpaceSaving): per-priority order-value
   *  percentiles built INCREMENTALLY in the q95 cube flow — even order
   *  keys sketch into binary states stored in a snapshot table (once per
   *  scale dir), odd keys sketch fresh at query time, and the serve step
   *  merges stored ∪ fresh. k = 65536 exceeds every group's row count at
   *  any driver SF, so the sketch is in its EXACT regime: the state is
   *  the full sorted multiset (canonical — store-then-merge ≡ one pass,
   *  spec-pinned bit-identical) and the served quantile follows the
   *  `percentile_disc` rule — smallest value whose cumulative count
   *  reaches q·n, IEEE-compared — which the oracle replays verbatim with
   *  a window. The estimator regime (k-bounded error) is ExtSpec's. */
  private def quantileSketchQuery(s: SparkSession, dir: String): DataFrame = {
    def half(rem: Int) = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 2 === rem)
      .select(col("o_orderpriority"), col("o_totalprice"))
    val store = warmTable("quantile_cube", dir) {
      SnapshotTable.create(s,
        trackedTempDir("graft_quantile_cube").toString,
        half(0).groupBy("o_orderpriority")
          .agg(ext.functions.quantileState(col("o_totalprice"), 65536).as("state")))
    }
    val fresh = half(1).groupBy("o_orderpriority")
      .agg(ext.functions.quantileState(col("o_totalprice"), 65536).as("state"))
    // all four quantiles from ONE merged buffer and one sorted sweep
    // (quantileMergeMulti), projected to scalars for the comparator
    store.read().unionByName(fresh)
      .groupBy("o_orderpriority")
      .agg(ext.functions.quantileMergeMulti(
        col("state"), Seq(0.25, 0.5, 0.75, 0.99), 65536).as("ps"))
      .select(col("o_orderpriority"),
        col("ps")(0).as("p25"), col("ps")(1).as("p50"),
        col("ps")(2).as("p75"), col("ps")(3).as("p99"))
      .orderBy("o_orderpriority")
  }
  private val Q109Duck =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_totalprice AS v,
      |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
      |         count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority,
      |  min(CASE WHEN rn::DOUBLE >= 0.25::DOUBLE * n THEN v END) AS p25,
      |  min(CASE WHEN rn::DOUBLE >= 0.5::DOUBLE * n THEN v END) AS p50,
      |  min(CASE WHEN rn::DOUBLE >= 0.75::DOUBLE * n THEN v END) AS p75,
      |  min(CASE WHEN rn::DOUBLE >= 0.99::DOUBLE * n THEN v END) AS p99
      |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q110 — KMV distinct-count sketch in its ESTIMATOR regime,
   *  cross-engine-proven: q58/q95 pin the exact regime (k exceeds the
   *  true distinct count, oracle = `count(DISTINCT)`); here k = 64 sits
   *  far BELOW every group's ~1300 distinct customers, so the served
   *  number is the estimator n̂ = (k−1)/u₍ₖ₎ — and the oracle replays
   *  that arithmetic from first principles in DuckDB: XXH64 of each
   *  distinct key (the hash's multiply/rotate/xor pipeline spelled out
   *  in 128-bit modular SQL arithmetic, [[Q110Duck]]'s `mul64`), rank to
   *  the k-th smallest unsigned hash, map it to the unit interval with
   *  the SAME two IEEE roundings the JVM performs (signed-long→double,
   *  then +2⁶³), divide, round. A deviation ANYWHERE — hash constants,
   *  unsigned ordering, the estimator formula, its floating-point
   *  evaluation order — shifts an estimate and fails the hash. This is
   *  the guarantee that stored sketch states are portable: another
   *  engine can serve them by replaying published arithmetic. */
  private def kmvEstimatorQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(ext.functions.kmvDistinct(col("o_custkey"), 64).as("nd_est"))
      .orderBy("o_orderpriority")

  /** DuckDB replay of XXH64(hashLong) + the KMV estimator. Built
   *  programmatically: `mul64` expands to 64-bit modular multiplication
   *  via 32-bit limbs in HUGEINT (a 64×64 product would overflow even
   *  128-bit), rotations are shift-pairs on disjoint bit ranges, and the
   *  constants are Spark's XXH64 primes with the engine's fixed seed. */
  private val Q110Duck: String = {
    val M = "18446744073709551616" // 2^64
    val P1 = BigInt("11400714785074694791") // 0x9E3779B185EBCA87
    val P2 = BigInt("14029467366897019727") // 0xC2B2AE3D27D4EB4F
    val P3 = BigInt("1609587929392839161") //  0x165667B19E3779F9
    val P4 = BigInt("9650029242287828579") //  0x85EBCA77C2B2AE63
    // seed + PRIME64_5 + 8 (mod 2^64): hashLong's initial accumulator
    val H0 = "14270892269335798754"
    def mul64(a: String, b: BigInt): String = {
      val bLo = b % BigInt(4294967296L)
      val bHi = b / BigInt(4294967296L)
      s"(($a % 4294967296) * $bLo + ((($a % 4294967296) * $bHi + " +
        s"($a // 4294967296) * $bLo) % 4294967296) * 4294967296) % $M"
    }
    s"""WITH vals AS (
       |  SELECT DISTINCT o_orderpriority, o_custkey::HUGEINT AS x FROM orders),
       |s1 AS (SELECT o_orderpriority, ${mul64("x", P2)} AS t1 FROM vals),
       |s2 AS (SELECT o_orderpriority, (t1 * 2147483648 % $M) + (t1 // 8589934592) AS t2 FROM s1),
       |s3 AS (SELECT o_orderpriority, xor($H0::HUGEINT, ${mul64("t2", P1)}) AS h1 FROM s2),
       |s4 AS (SELECT o_orderpriority, (h1 * 134217728 % $M) + (h1 // 137438953472) AS h2 FROM s3),
       |s5 AS (SELECT o_orderpriority, (${mul64("h2", P1)} + $P4) % $M AS h3 FROM s4),
       |f1 AS (SELECT o_orderpriority, xor(h3, h3 // 8589934592) AS g1 FROM s5),
       |f2 AS (SELECT o_orderpriority, ${mul64("g1", P2)} AS g2 FROM f1),
       |f3 AS (SELECT o_orderpriority, xor(g2, g2 // 536870912) AS g3 FROM f2),
       |f4 AS (SELECT o_orderpriority, ${mul64("g3", P3)} AS g4 FROM f3),
       |f5 AS (SELECT o_orderpriority, xor(g4, g4 // 4294967296) AS h FROM f4),
       |ranked AS (
       |  SELECT o_orderpriority, h,
       |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT o_orderpriority, h FROM f5)),
       |kth AS (SELECT o_orderpriority, h FROM ranked WHERE rn = 64)
       |SELECT o_orderpriority,
       |  floor(63::DOUBLE / (((h - 9223372036854775808)::BIGINT::DOUBLE + 9.223372036854776e18)
       |    / 1.8446744073709552e19) + 0.5::DOUBLE)::BIGINT AS nd_est
       |FROM kth ORDER BY o_orderpriority""".stripMargin
  }

  /** Q111 — EXTERNAL-ENGINE manifest consumption proof
   *  ([[SnapshotTable.generateSymlinkManifest]]; reference
   *  `delta/delta_scd_script.py:42-43,57-60` generates the same artifact
   *  so Athena can query the Delta table): the table is mutated (CoW
   *  delete, append, compaction — each one rewrites or retires files),
   *  the symlink manifest is published, and the query then reads ONLY
   *  what a foreign engine would touch — the plain-text path list plus
   *  plain parquet reads of exactly those files, no snapshot/manifest
   *  code in the read path. The oracle recomputes the expected LOGICAL
   *  table from the base data: a stale manifest (pre-compaction or
   *  pre-delete list — those superseded files still exist physically
   *  until vacuum, so a stale list READS fine but reads WRONG rows)
   *  shifts the aggregate and fails the hash. */
  private def manifestExternalQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("manifest_external", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val tbl = SnapshotTable.create(s,
        trackedTempDir("graft_manifest_ext").toString,
        orders.repartitionByRange(8, col("o_orderkey")))
      tbl.delete(col("o_orderpriority") === "5-LOW")
      tbl.append(orders.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_orderstatus", lit("RESTATED")))
      tbl.compact()
      tbl
    }
    val manifest = t.generateSymlinkManifest()
    // the foreign-reader path: list of live files, then bare parquet
    val files = s.read.textFile(manifest).collect().toSeq.filter(_.nonEmpty)
    s.read.parquet(files: _*)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_price"))
      .orderBy("o_orderpriority", "o_orderstatus")
  }
  private val Q111Duck =
    """WITH logical AS (
      |  SELECT o_orderpriority, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderpriority <> '5-LOW'
      |  UNION ALL
      |  SELECT o_orderpriority, 'RESTATED' AS o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 97 = 0)
      |SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      |FROM logical GROUP BY o_orderpriority, o_orderstatus
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** Q112 — MERGE WITH SCHEMA EVOLUTION, both axes in one commit
   *  ([[graft.ops.MergeInto.withSchemaEvolution]]; Delta's
   *  `autoMerge`/type-widening merge semantics): the target stores
   *  `price32` as FLOAT; the source restates matching orders with a
   *  DOUBLE price (a lossless widening — the target column is retyped in
   *  the same commit) and carries a brand-new `channel` column (appended
   *  nullable; untouched rows read NULL, and untouched FILES keep their
   *  narrow float physical type, upcasting at scan). The oracle replays
   *  the evolved merge as a LEFT JOIN over the base data, including the
   *  exact float→double round-trip for untouched rows — a wrong widening
   *  (double-rounding, a dropped retype, a truncated value) or a
   *  mis-routed clause shifts values and fails the hash. */
  private def mergeEvolutionQuery(s: SparkSession, dir: String): DataFrame = {
    val t = warmTable("merge_evolution", dir) {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val tbl = SnapshotTable.create(s,
        trackedTempDir("graft_merge_evo").toString,
        orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("float").as("price32")))
      val src = orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"), lit("EVOLVED").as("o_orderstatus"),
          col("o_totalprice").as("price32"), lit("online").as("channel"))
      tbl.merge(src, col("t.o_orderkey") === col("s.o_orderkey"))
        .withSchemaEvolution()
        .whenMatched().updateAll()
        .execute()
      tbl
    }
    t.read()
      .filter(col("o_orderkey") % 100 < 20)
      .select(col("o_orderkey"), col("o_orderstatus"), col("price32"), col("channel"))
      .orderBy("o_orderkey")
  }
  private val Q112Duck =
    """WITH target AS (
      |  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS FLOAT) AS price32
      |  FROM orders),
      |src AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 3),
      |merged AS (
      |  SELECT t.o_orderkey,
      |    CASE WHEN s.o_orderkey IS NOT NULL THEN 'EVOLVED' ELSE t.o_orderstatus END
      |      AS o_orderstatus,
      |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
      |         ELSE t.price32::DOUBLE END AS price32,
      |    CASE WHEN s.o_orderkey IS NOT NULL THEN 'online' END AS channel
      |  FROM target t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey)
      |SELECT o_orderkey, o_orderstatus, price32, channel FROM merged
      |WHERE o_orderkey % 100 < 20 ORDER BY o_orderkey""".stripMargin

  /** Q96's exported tokenizer: merges that build "hello" into one piece
   *  (id 256+3 = 259) and "world" into [wor = 261, l = 108, d = 100]. */
  private val Q96Merges = Seq("h" -> "e", "he" -> "l", "hel" -> "l",
    "hell" -> "o", "w" -> "o", "wo" -> "r")

  /** Q96 — byte-level BPE tokenization ([[ext.functions.bpeEncode]],
   *  GPT-2-family tokenizer inference over an exported merges list, run
   *  map-side inside codegen — no tokenizer service, no join, no
   *  shuffle). Each document plants `a = 1 + id%4` copies of "hello" and
   *  `b = 1 + id%3` of "world"; under [[Q96Merges]] the exact greedy
   *  algorithm must produce a + 3b pieces summing to 259a + 469b, with
   *  piece boundaries 259 / 100 — so the oracle replays the ENCODING as
   *  pure arithmetic while the engine really runs the merge loop. */
  private def bpeEncodeQuery(s: SparkSession, dir: String): DataFrame = {
    val a = (col("doc_id") % 4 + 1).cast("int")
    val b = (col("doc_id") % 3 + 1).cast("int")
    val text = concat_ws(" ",
      flatten(array(array_repeat(lit("hello"), a), array_repeat(lit("world"), b))))
    val ids = ext.functions.bpeEncode(text, Q96Merges)
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), ids.as("ids"))
      .select(col("doc_id"),
        size(col("ids")).as("n_pieces"),
        aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("ids_sum"),
        element_at(col("ids"), 1).as("first_id"),
        element_at(col("ids"), -1).as("last_id"))
      .orderBy("doc_id")
  }
  private val Q96Duck =
    """SELECT doc_id,
      |  CAST((1 + doc_id % 4) + 3 * (1 + doc_id % 3) AS INT) AS n_pieces,
      |  CAST((1 + doc_id % 4) * 259 + (1 + doc_id % 3) * 469 AS BIGINT) AS ids_sum,
      |  259 AS first_id, 100 AS last_id
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q100 — BPE TRAINING ([[ext.BpeTrain.train]], the learning half of
   *  the GPT-2 tokenizer pipeline whose inference half is q96): learn 8
   *  merges from the planted per-doc corpus (a = 1+id%4 "hello"s,
   *  b = 1+id%3 "world"s — word counts A = Σa > B = Σb for every
   *  corpus of ≥4 docs), then re-encode the corpus with the LEARNED
   *  tokenizer. The winner rule (count desc, left id asc, right id asc)
   *  makes the whole 8-round trace hand-derivable — (e,l) (h,el) (l,o)
   *  (hel,lo) (l,d) (o,r) (w,or) (wor,ld) — so `merges_fp`
   *  (Σ (rank+1)·(4096·l + r)) pins the exact learned list and order,
   *  and the per-doc stats (hello→259, world→263, single pieces each)
   *  pin the training→inference round trip; the oracle replays both as
   *  pure arithmetic. */
  private def bpeTrainQuery(s: SparkSession, dir: String): DataFrame = {
    val a = (col("doc_id") % 4 + 1).cast("int")
    val b = (col("doc_id") % 3 + 1).cast("int")
    val text = concat_ws(" ",
      flatten(array(array_repeat(lit("hello"), a), array_repeat(lit("world"), b))))
    val corpus = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), text.as("text"))
    val merges = ext.BpeTrain.train(corpus, "text", numMerges = 8)
    val fp = merges.zipWithIndex.map { case ((l, r), i) =>
      (i + 1).toLong * (4096L * l + r)
    }.sum
    corpus
      .select(col("doc_id"), ext.functions.bpeEncodeIds(col("text"), merges).as("ids"))
      .select(col("doc_id"),
        size(col("ids")).as("n_pieces"),
        aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("ids_sum"),
        element_at(col("ids"), 1).as("first_id"),
        element_at(col("ids"), -1).as("last_id"),
        lit(fp).as("merges_fp"))
      .orderBy("doc_id")
  }
  private val Q100Duck =
    """SELECT doc_id,
      |  CAST((1 + doc_id % 4) + (1 + doc_id % 3) AS INT) AS n_pieces,
      |  CAST((1 + doc_id % 4) * 259 + (1 + doc_id % 3) * 263 AS BIGINT) AS ids_sum,
      |  259 AS first_id, 263 AS last_id,
      |  CAST(23747492 AS BIGINT) AS merges_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Q59 — corpus vocabulary ([[ext.TextAnalysis.vocabulary]]): per-token
   *  total and document frequency over the documents table, thresholded
   *  at 20 occurrences (the word-count shape: map-side explode, partial
   *  agg before the shuffle, two-phase distinct for df). */
  private def vocabQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.vocabulary(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", minCount = 20L)
      .orderBy("token")
  private val Q59Duck =
    """SELECT t AS token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |GROUP BY 1 HAVING count(*) >= 20 ORDER BY token""".stripMargin

  /** Q60 — SpaceSaving frequent-items sketch ([[ext.functions
   *  .approxTopItems]]): top 8 tokens per language with capacity-bounded
   *  state. capacity = 65536 exceeds any language's vocabulary at driver
   *  SFs, so the sketch is exact (err = 0 dropped from the output) and
   *  the count/row_number oracle is precise; the eviction regime is
   *  covered by `ExtSpec`. */
  private def topItemsQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(ext.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("lang")
      .agg(ext.functions.approxTopItems(col("token"), 65536, 8).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).as("rn"),
        col("t.item").as("item"), col("t.cnt").as("cnt"))
      .orderBy("lang", "rn")
  private val Q60Duck =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS item FROM documents),
      |c AS (SELECT lang, item, count(*) AS cnt FROM tok GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY lang ORDER BY cnt DESC, item) AS rn FROM c)
      |SELECT lang, CAST(rn AS INT) AS rn, item, cnt FROM r WHERE rn <= 8
      |ORDER BY lang, rn""".stripMargin

  /** Q61 — materialized context windows ([[ext.Packing.packSequences]]):
   *  q57's greedy assignment with each bin's documents joined in id order
   *  inside the same streaming pass — one row per training sequence, one
   *  shuffle total. The oracle extends q57's recursive CTE with an
   *  ordered string_agg per bin. */
  private def packSeqQuery(s: SparkSession, dir: String): DataFrame =
    ext.Packing.packSequences(
        s.read.parquet(s"$dir/documents.parquet"),
        col("doc_id") % 8, col("doc_id"),
        ext.TextAnalysis.tokenCount(col("text")), col("text"), capacity = 256)
      .orderBy("shard", "bin_id")
  private val Q61Duck =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id % 8 AS shard, doc_id, text,
      |         CAST(len(string_split(text,' ')) AS INT) AS n_tokens
      |  FROM documents),
      |s AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |      FROM t),
      |p AS (
      |  SELECT shard, doc_id, text, n_tokens, rn, 0 AS bin_id, n_tokens AS fill
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.shard, s.doc_id, s.text, s.n_tokens, s.rn,
      |         CASE WHEN p.fill + s.n_tokens > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
      |         CASE WHEN p.fill + s.n_tokens > 256 THEN s.n_tokens
      |              ELSE p.fill + s.n_tokens END
      |  FROM p JOIN s ON s.shard = p.shard AND s.rn = p.rn + 1)
      |SELECT shard, bin_id, CAST(count(*) AS INT) AS n_docs,
      |       CAST(sum(n_tokens) AS INT) AS bin_tokens,
      |       string_agg(text, ' ' ORDER BY doc_id) AS seq_text
      |FROM p GROUP BY shard, bin_id ORDER BY shard, bin_id""".stripMargin

  /** Q62 — duplicated-n-gram fraction ([[ext.TextAnalysis
   *  .duplicateNgramFraction]]): the share of each document's word
   *  10-grams appearing more than once across the corpus. The engine
   *  joins on 64-bit gram hashes; the oracle replays the grams as
   *  strings — identical counts modulo 2⁻⁶⁴ collisions (q54 argument). */
  private def dupSpanQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.duplicateNgramFraction(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 10)
      .orderBy("doc_id")
  private val Q62Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |g AS (SELECT doc_id,
      |        unnest([array_to_string(tk[i:i+9], ' ') for i in range(1, len(tk)-8)]) AS gram
      |      FROM t WHERE len(tk) >= 10),
      |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
      |f AS (SELECT doc_id,
      |        round(avg(CASE WHEN cnt > 1 THEN 1.0 ELSE 0.0 END), 6) AS dup_ngram_frac
      |      FROM g JOIN c USING (gram) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(f.dup_ngram_frac, 0.0) AS dup_ngram_frac
      |FROM documents d LEFT JOIN f USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Q71 — corpus-wide exact duplicated-span removal
   *  ([[ext.TextAnalysis.removeDuplicatedSpans]], Lee et al. 2022 exact
   *  substring dedup): every duplicated 10-token span keeps only its
   *  canonical first occurrence (min (doc_id, pos)); covered tokens are
   *  cut and documents rebuilt. Spark mines on 64-bit gram hashes; the
   *  oracle replays the same algebra on the gram strings — identical
   *  removals modulo 2⁻⁶⁴ collisions (the q62 argument). */
  private def spanRemovalQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.removeDuplicatedSpans(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 10)
      .orderBy("doc_id")
  private val Q71Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |g0 AS (SELECT doc_id,
      |         unnest([{'pos': i - 1, 'gram': array_to_string(tk[i:i+9], ' ')}
      |                 for i in range(1, len(tk) - 8)]) AS o
      |       FROM t WHERE len(tk) >= 10),
      |g AS (SELECT doc_id, o.pos AS pos, o.gram AS gram FROM g0),
      |c AS (SELECT gram, count(*) AS cnt,
      |             min({'d': doc_id, 'p': pos}) AS canon
      |      FROM g GROUP BY gram),
      |rm AS (SELECT doc_id, pos FROM g JOIN c USING (gram)
      |       WHERE cnt > 1 AND {'d': doc_id, 'p': pos} <> canon),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 10)) AS p FROM rm),
      |tok0 AS (SELECT doc_id,
      |           unnest([{'p': i - 1, 'token': tk[i]} for i in range(1, len(tk) + 1)]) AS o
      |         FROM t),
      |tok AS (SELECT doc_id, o.p AS p, o.token AS token FROM tok0),
      |kept AS (SELECT tok.doc_id, tok.p, tok.token FROM tok
      |         ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p)
      |SELECT d.doc_id,
      |       coalesce(string_agg(k.token, ' ' ORDER BY k.p), '') AS clean_text,
      |       len(string_split(d.text, ' ')) - count(k.token) AS n_removed
      |FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
      |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin

  /** Q72 — Okapi BM25 full-text top-k ([[ext.Search.bm25TopK]]): corpus
   *  retrieval without an external search service. Integer tf/df/dl
   *  feed an IEEE-double formula both engines evaluate identically;
   *  ranking and emitted score are both decided on the 4-decimal
   *  rounding so rank and value can never disagree cross-engine. */
  private def bm25Query(s: SparkSession, dir: String): DataFrame =
    ext.Search.bm25TopK(
      s.read.parquet(s"$dir/documents.parquet"),
      "doc_id", "text", query = "vector merge stream", k = 20)
  private val Q72Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tfq AS (SELECT doc_id, token, count(*) AS tf FROM tok
      |        WHERE token IN ('vector', 'merge', 'stream') GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tfq GROUP BY 1),
      |s AS (SELECT tfq.doc_id,
      |        sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
      |            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS raw
      |      FROM tfq JOIN dfreq USING (token) JOIN dl USING (doc_id)
      |      CROSS JOIN stats GROUP BY tfq.doc_id)
      |SELECT doc_id, round(raw, 4) AS bm25 FROM s
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Q73 — composable C4/Gopher quality filter
   *  ([[ext.TextAnalysis.qualityFilter]]): five independent rule
   *  verdicts, the bitmask of failed rules, and the kept conjunction —
   *  the audit-friendly form of corpus filtering. All five signals are
   *  integer counts into single IEEE divisions; the oracle replays each
   *  rule verbatim (trigram distinct via strings vs 64-bit hashes — the
   *  q50 collision argument). */
  private def qualityFilterQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.qualityFilter(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .orderBy("doc_id")
  private val Q73Duck = {
    val stops = ext.TextAnalysis.langMarkers.head._2
      .map("'" + _ + "'").mkString("[", ",", "]")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
       |s AS (SELECT doc_id, len(tk) AS n,
       |  (length(text) - (len(tk) - 1)) * 1.0 / len(tk) AS avgw,
       |  len(list_filter(tk, x -> list_contains($stops, x))) AS hits,
       |  CASE WHEN len(tk) - 2 > 0
       |    THEN 1.0 - len(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
       |                                  for i in range(1, len(tk) - 1)])) * 1.0 / (len(tk) - 2)
       |    ELSE 0.0 END AS rep,
       |  len(list_distinct(tk)) * 1.0 / len(tk) AS dis
       |FROM t),
       |r AS (SELECT doc_id,
       |  n BETWEEN 30 AND 100000 AS len_ok,
       |  avgw BETWEEN 3.0 AND 10.0 AS avg_word_ok,
       |  hits >= 2 AS stopwords_ok,
       |  rep <= 0.05 AS repetition_ok,
       |  dis >= 0.35 AS distinct_ok FROM s)
       |SELECT doc_id, len_ok, avg_word_ok, stopwords_ok, repetition_ok, distinct_ok,
       |  CASE WHEN len_ok THEN 0 ELSE 1 END + CASE WHEN avg_word_ok THEN 0 ELSE 2 END
       |  + CASE WHEN stopwords_ok THEN 0 ELSE 4 END
       |  + CASE WHEN repetition_ok THEN 0 ELSE 8 END
       |  + CASE WHEN distinct_ok THEN 0 ELSE 16 END AS fail_mask,
       |  len_ok AND avg_word_ok AND stopwords_ok AND repetition_ok AND distinct_ok AS kept
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Q74 — Johnson–Lindenstrauss random projection
   *  ([[ext.Similarity.randomProjection]], 64 → 16 dims): the Rademacher
   *  sign matrix derives from the engine-portable BIGINT hash, the
   *  float→double widening is exact, and both engines fold the sum
   *  left-to-right — so the oracle replays the projection to the last
   *  rounded decimal. Exploded to (vec_id, j, p) scalar rows. */
  private def randomProjQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        posexplode(ext.Similarity.randomProjection(col("embedding"), 16))
          .as(Seq("j", "p")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        // + 0.0 canonicalizes IEEE signed zero: a sum that is exactly
        // zero can carry either sign depending on the engine's fold,
        // and -0.0 vs 0.0 hash-mismatch under repr-based comparators
        (round(col("p"), 4) + lit(0.0)).as("p"))
      .orderBy("vec_id", "j")
  private val Q74Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt
    val stride = ext.Similarity.ProjIndexStride
    s"""WITH p AS (SELECT vec_id,
       |  [{'j': j, 'p': round(list_sum(list_transform(range(len(embedding)),
       |       i -> embedding[i+1] * CASE WHEN
       |         ((((j * $stride + i) % $m) * $a + $salt) % $m * $a + $salt) % $m
       |           < ${m / 2} THEN 1.0 ELSE -1.0 END)) / 4.0, 4) + 0.0}
       |   for j in range(16)] AS pr
       |  FROM embeddings),
       |u AS (SELECT vec_id, unnest(pr) AS o FROM p)
       |SELECT vec_id, o.j AS j, o.p AS p FROM u ORDER BY vec_id, j""".stripMargin
  }

  /** Q75 — incremental exact-span dedup
   *  ([[ext.TextAnalysis.removeDuplicatedSpansIncremental]]): the
   *  steady-state form of q71 — an ingest batch dedups against the
   *  already-ingested corpus represented ONLY by its 8-byte-per-gram
   *  [[ext.TextAnalysis.spanGramIndex]]; the corpus text never
   *  re-scans. Because batch ids order after corpus ids, the cleaned
   *  batch is BIT-IDENTICAL to a full-corpus batch run, so the oracle
   *  is q71's replay restricted to the batch — an exact hash-match
   *  oracle for the incremental path, no structural weakening. */
  private def incrementalSpanQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    // the 8-byte-per-gram index AS PERSISTED STATE (q66's pattern): one
    // snapshot table per scale dir; the measured query is the serving
    // cost — read the stored grams, clean the batch
    val index = warmTable("span_gram_index", dir) {
      ext.TextAnalysis.buildSpanGramIndexTable(s,
        trackedTempDir("graft_span_index").toString,
        corpus, "doc_id", "text", n = 10) // pins graft.spangram.n
    }
    ext.TextAnalysis.removeDuplicatedSpansIncremental(
        index, batch, "doc_id", "text", n = 10) // geometry-validated serve
      .orderBy("doc_id")
  }
  private val Q75Duck = Q71Duck.replace(
    "GROUP BY d.doc_id, d.text ORDER BY d.doc_id",
    "WHERE d.doc_id >= 250 GROUP BY d.doc_id, d.text ORDER BY d.doc_id")

  /** Q76 — corpus-self-scored unigram-LM mean log-probability
   *  ([[ext.TextAnalysis.unigramLogProb]]): the perplexity-proxy quality
   *  signal of CCNet-style pipelines. Integer tf/total/|V| into one ln
   *  per token; score decided on the 4-decimal rounding (q72's
   *  cross-engine argument). */
  private def unigramLpQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.unigramLogProb(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .orderBy("doc_id")

  /** Q90 — bigram-LM scoring ([[ext.TextAnalysis.bigramLogProb]], the
   *  CCNet/KenLM perplexity-filter role): every document scored by the
   *  average ln P(w₂|w₁) under the corpus's own add-one-smoothed bigram
   *  model. The oracle replays the zipped-bigram extraction, both count
   *  aggs, and the smoothing arithmetic — integer counts into IEEE
   *  ln/division, rounded at 4 decimals like q76 — so the whole score
   *  column is exact, not structural. */
  private def bigramLpQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.bigramLogProb(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .orderBy("doc_id")
  /** Q91 — gap-based sessionization via `session_window`, Spark's native
   *  session-window operator in BATCH mode (the same operator serves
   *  streaming aggregation): per user, events separated by less than the
   *  30-minute gap merge into one session spanning [first_ts,
   *  last_ts + gap). One shuffle on user_id; sessions form inside each
   *  hash partition. The oracle replays the merge with the textbook
   *  lag/cumsum window construction — a break wherever the gap from the
   *  previous event EXCEEDS 30 minutes (session_window's window
   *  [ts, ts+gap] is closed on the right: an event landing exactly at
   *  the previous end still merges, pinned by spec) — proving the
   *  operator's session
   *  assignment exactly; value sums ride DECIMAL (the q11 convention) so
   *  both engines are exact. */
  private def sessionWindowQuery(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir) // events via the type-normalized view (ts drift)
    s.table("events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }
  private val Q91Duck =
    """WITH m AS (SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Q92 — collocation mining ([[ext.TextAnalysis.pmiCollocations]]):
   *  the corpus's strongest bigram phrases by pointwise mutual
   *  information over the ≥5-count bigram types, the Mikolov-style
   *  phrase glue step. Log-space scoring (no c·N overflow at scale),
   *  TakeOrderedAndProject top-k, and the ROUNDED-score ordering with a
   *  lexicographic tiebreak make the selected set replay exactly. */
  private def pmiQuery(s: SparkSession, dir: String): DataFrame =
    ext.TextAnalysis.pmiCollocations(
      s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      minCount = 5, k = 15)
  private val Q92Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bb AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
      |       FROM t WHERE len(tk) >= 2),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bb GROUP BY 1, 2),
      |cl AS (SELECT w1, sum(c2) AS cl FROM c2 GROUP BY 1),
      |cr AS (SELECT w2, sum(c2) AS cr FROM c2 GROUP BY 1),
      |n AS (SELECT sum(c2) AS n_bi FROM c2)
      |SELECT w1, w2, c2, round(ln(c2) + ln(n_bi) - ln(cl) - ln(cr), 4) AS pmi
      |FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN n
      |WHERE c2 >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 15""".stripMargin

  private val Q90Duck =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |bb AS (SELECT doc_id,
      |         unnest(tk[1:len(tk)-1]) AS w1,
      |         unnest(tk[2:len(tk)]) AS w2
      |       FROM t WHERE len(tk) >= 2),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bb GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
      |vs AS (SELECT count(DISTINCT token) AS vs FROM
      |        (SELECT unnest(string_split(text, ' ')) AS token FROM documents))
      |SELECT doc_id, round(avg(ln((c2 + 1.0) / (c1 + vs))), 4) AS avg_logprob2
      |FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vs
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  private val Q76Duck =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1),
      |s AS (SELECT sum(tf) AS total, count(*) AS vs FROM v)
      |SELECT doc_id, round(avg(ln((tf + 1.0) / (total + vs))), 4) AS avg_logprob
      |FROM tok JOIN v USING (token) CROSS JOIN s
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Q82 — DSIR importance weights ([[ext.TextAnalysis.dsirWeights]],
   *  Xie et al. 2023): every document scored by the unigram-LM
   *  log-likelihood ratio between the TARGET domain (the `en` slice)
   *  and the raw corpus. English documents must surface with positive
   *  weights, off-target languages negative — and the oracle replays
   *  the add-one-smoothed shared-vocabulary arithmetic to the rounded
   *  decimal, so the whole ranking is exact, not structural. */
  private def dsirQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    ext.TextAnalysis.dsirWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text")
      .orderBy("doc_id")
  }
  /** The DSIR weight pipeline as shared CTEs — Q82Duck exposes it as
   *  rows, Q83Duck builds the Gumbel ranking on top. ONE definition so
   *  the two oracles cannot drift apart. */
  private val DsirWeightCtes =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |ttok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents WHERE lang = 'en'),
      |craw AS (SELECT token, count(*) AS tf_raw FROM tok GROUP BY 1),
      |ttf AS (SELECT token, count(*) AS tf_tgt FROM ttok GROUP BY 1),
      |v AS (SELECT coalesce(craw.token, ttf.token) AS token,
      |             coalesce(tf_raw, 0) AS tf_raw, coalesce(tf_tgt, 0) AS tf_tgt
      |      FROM craw FULL OUTER JOIN ttf ON craw.token = ttf.token),
      |s AS (SELECT sum(tf_raw) AS total_raw, sum(tf_tgt) AS total_tgt,
      |             count(*) AS vs FROM v),
      |w AS (SELECT doc_id, round(avg(
      |        ln((tf_tgt + 1.0) / (total_tgt + vs)) -
      |        ln((tf_raw + 1.0) / (total_raw + vs))), 4) + 0.0 AS dsir_weight
      |      FROM tok JOIN v USING (token) CROSS JOIN s GROUP BY doc_id)""".stripMargin
  private val Q82Duck =
    s"""WITH $DsirWeightCtes
       |SELECT doc_id, dsir_weight FROM w ORDER BY doc_id""".stripMargin

  /** Q83 — DSIR resampling ([[ext.Sampling.gumbelTopK]] over
   *  [[ext.TextAnalysis.dsirWeights]]): the paper's actual selection
   *  step — sample 100 documents without replacement with probability
   *  ∝ exp(weight/T) via the Gumbel-max trick, made rebuild-stable by
   *  drawing each document's Gumbel noise from the engine-portable id
   *  hash instead of RNG state. The oracle replays weight, hash, noise,
   *  and ranking to the exact double, so the selected SET and its
   *  ordering are exact. */
  private def dsirSampleQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val weights = ext.TextAnalysis.dsirWeights(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text")
    ext.Sampling.gumbelTopK(weights, "doc_id", "dsir_weight", k = 100)
      .select(col("doc_id"), col("dsir_weight"), round(col("gumbel_key"), 4).as("gkey"))
      .orderBy("doc_id")
  }
  private val Q83Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt
    s"""WITH $DsirWeightCtes,
       |g AS (SELECT doc_id, dsir_weight,
       |        dsir_weight - ln(-ln(
       |          (((((doc_id % $m) * $a + $salt) % $m * $a + $salt) % $m) + 0.5) / $m
       |        )) AS gumbel_key
       |      FROM w),
       |topk AS (SELECT * FROM g ORDER BY gumbel_key DESC, doc_id LIMIT 100)
       |SELECT doc_id, dsir_weight, round(gumbel_key, 4) AS gkey FROM topk
       |ORDER BY doc_id""".stripMargin
  }

  /** Q63 — deterministic train/val/test split assignment
   *  ([[ext.Sampling.assignSplits]], 80/10/10 by id hash): every row's
   *  label is pure BIGINT arithmetic, replayed exactly by the oracle —
   *  a rebuilt corpus assigns every document to the identical split. */
  private def splitQuery(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.assignSplits(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("doc_id")
  private val Q63Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt
    def thr(f: Double) = ext.Sampling.threshold(f)
    s"""SELECT doc_id,
       |  CASE WHEN b < ${thr(0.8)} THEN 'train'
       |       WHEN b < ${thr(0.9)} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT doc_id,
       |    (((doc_id % $m) * $a + $salt) % $m * $a + $salt) % $m AS b
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Q65 — deterministic epoch shuffle ([[ext.Sampling.epochShuffle]]):
   *  a rebuild-stable global training order per epoch, with a contiguous
   *  position from range-sort + zipWithIndex (no global window). The
   *  oracle replays the BIGINT hash recipe and ranks with row_number —
   *  order and positions must agree exactly. */
  private def epochShuffleQuery(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.epochShuffle(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id"),
        "doc_id", epoch = 3)
      .select(col("doc_id"), col("pos"))
      .orderBy("doc_id")
  private val Q65Duck = {
    val m = ext.Sampling.Modulus
    val a = ext.Sampling.Mult
    val salt = ext.Sampling.DefaultSalt + 3 // epoch folds into the salt
    s"""SELECT doc_id,
       |  row_number() OVER (ORDER BY
       |    (((doc_id % $m) * $a + $salt) % $m * $a + $salt) % $m, doc_id) - 1 AS pos
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Q117 — INDEXED incremental serve
   *  ([[ext.Dedup.buildMinhashIndexTables]] /
   *  [[ext.Dedup.minhashPairsIncrementalIndexed]]): q66's exact
   *  batch-vs-corpus scenario, but the serve key-probes PERSISTED
   *  band/signature snapshot tables (range-clustered + per-file blooms
   *  on the probe columns) instead of streaming the whole signature
   *  index through the band join — the 100 TB serving shape where
   *  per-batch cost rides the batch's matches, not the index size.
   *  Pruning is file-skipping only, so the oracle is q66's verbatim;
   *  flat-vs-indexed pair-list identity is ExtSpec-pinned. */
  private val builtIndexPairs = scala.collection.concurrent.TrieMap[
    String, (graft.tables.SnapshotTable, graft.tables.SnapshotTable)]()
  private def indexedServeQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val (bandT, sigT) = builtIndexPairs.getOrElseUpdate(dir, {
      val tmp = trackedTempDir("graft_q117_idx")
      ext.PhaseLog.timed("build")(ext.Dedup.buildMinhashIndexTables(s,
        s"$tmp/bands", s"$tmp/sigs", corpus, "doc_id", "text"))
    })
    val copies = docs.filter(col("doc_id") % 4 === 0)
      .select(shiftedId(col("doc_id")).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 4 === 2)
      .select((shiftedId(col("doc_id")) + lit(PlantShift)).as("doc_id"),
        format_string("zqa%d zqb%d zqc%d zqd%d zqe%d",
          col("doc_id"), col("doc_id"), col("doc_id"), col("doc_id"),
          col("doc_id")).as("text"))
    val batch = copies.unionByName(fresh)
    val pairs = ext.PhaseLog.timed("serve_pairs")(
      ext.Dedup.minhashPairsIncrementalIndexed(
        bandT, sigT, batch, "doc_id", "text"))
    val corpusFound = pairs
      .filter(col("in_corpus"))
      .select(col("id_a").as("doc_id")).distinct().withColumn("cf", lit(1))
    val survived = ext.Dedup
      .dedupIncrementalFromPairs(pairs, batch, "doc_id")
      .select(col("doc_id")).withColumn("sv", lit(1))
    batch.select(col("doc_id"))
      .join(corpusFound, Seq("doc_id"), "left")
      .join(survived, Seq("doc_id"), "left")
      .select(
        when(col("doc_id") >= 2L * PlantShift, col("doc_id") - 2L * PlantShift)
          .otherwise(col("doc_id") - PlantShift).as("doc_id"),
        (col("doc_id") < 2L * PlantShift).as("is_copy"),
        col("cf").isNotNull.as("corpus_dup_found"),
        col("sv").isNotNull.as("survived"))
      .orderBy("doc_id")
  }

  /** Q124 — INDEX MAINTENANCE lifecycle (build → append → compact →
   *  vacuum → serve): q117's index pair is built on only HALF the
   *  corpus (doc_id % 4 = 0), extended to the full even-docs corpus by
   *  two [[ext.Dedup.minhashIndexAppend]] batches (signed under the
   *  tables' pinned geometry — the call site passes none), reclustered
   *  by [[ext.Dedup.compactMinhashIndex]] back to the build-time file
   *  floor, then VACUUMED (retain 1 version, zero window — the
   *  compaction's dead band/sig files and expired log slots reclaim;
   *  a long-lived index otherwise accumulates them). The declared
   *  result serves q117's exact batch over the vacuumed tables, so
   *  q66's oracle applies VERBATIM: an append that missed rows, signed
   *  at drifted geometry, a compaction that lost / duplicated /
   *  mis-clustered a signature, or a vacuum that reclaimed a LIVE file
   *  all change the served survivor set and fail the hash. ExtSpec
   *  pins the file-count mechanics; the 100 TB claim is the steady
   *  state this models — continuous ingest + scheduled maintenance +
   *  garbage collection with zero serve divergence. */
  private val builtMaintIndex = scala.collection.concurrent.TrieMap[
    String, (graft.tables.SnapshotTable, graft.tables.SnapshotTable)]()
  private def indexMaintenanceQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val (bandT, sigT) = builtMaintIndex.getOrElseUpdate(dir, {
      val tmp = trackedTempDir("graft_q124_idx")
      val pair = ext.PhaseLog.timed("build")(ext.Dedup.buildMinhashIndexTables(s,
        s"$tmp/bands", s"$tmp/sigs", docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text"))
      ext.PhaseLog.timed("append")(ext.Dedup.minhashIndexAppend(pair._1, pair._2,
        docs.filter(col("doc_id") % 8 === 2), "doc_id", "text"))
      ext.PhaseLog.timed("append")(ext.Dedup.minhashIndexAppend(pair._1, pair._2,
        docs.filter(col("doc_id") % 8 === 6), "doc_id", "text"))
      ext.PhaseLog.timed("compact")(ext.Dedup.compactMinhashIndex(pair._1, pair._2))
      // vacuum completes the maintenance lifecycle: the compaction's dead
      // band/sig files and expired log slots reclaim, and the serve below
      // must answer identically over the vacuumed tables (hash-gated) —
      // a vacuum that reclaimed a LIVE file would shift the survivor set
      ext.PhaseLog.timed("vacuum") {
        pair._1.vacuum(retainVersions = 1, retainMillis = 0L)
        pair._2.vacuum(retainVersions = 1, retainMillis = 0L)
      }
      pair
    })
    val copies = docs.filter(col("doc_id") % 4 === 0)
      .select(shiftedId(col("doc_id")).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 4 === 2)
      .select((shiftedId(col("doc_id")) + lit(PlantShift)).as("doc_id"),
        format_string("zqa%d zqb%d zqc%d zqd%d zqe%d",
          col("doc_id"), col("doc_id"), col("doc_id"), col("doc_id"),
          col("doc_id")).as("text"))
    val batch = copies.unionByName(fresh)
    val pairs = ext.PhaseLog.timed("serve_pairs")(
      ext.Dedup.minhashPairsIncrementalIndexed(
        bandT, sigT, batch, "doc_id", "text"))
    val corpusFound = pairs
      .filter(col("in_corpus"))
      .select(col("id_a").as("doc_id")).distinct().withColumn("cf", lit(1))
    val survived = ext.Dedup
      .dedupIncrementalFromPairs(pairs, batch, "doc_id")
      .select(col("doc_id")).withColumn("sv", lit(1))
    batch.select(col("doc_id"))
      .join(corpusFound, Seq("doc_id"), "left")
      .join(survived, Seq("doc_id"), "left")
      .select(
        when(col("doc_id") >= 2L * PlantShift, col("doc_id") - 2L * PlantShift)
          .otherwise(col("doc_id") - PlantShift).as("doc_id"),
        (col("doc_id") < 2L * PlantShift).as("is_copy"),
        col("cf").isNotNull.as("corpus_dup_found"),
        col("sv").isNotNull.as("survived"))
      .orderBy("doc_id")
  }

  /** Q126 — INDEXED span-dedup serve over a MAINTAINED gram index
   *  (the q117/q124 serving+maintenance discipline brought to the span
   *  family, completing the key-probed-serve triad: dedup, ANN, span):
   *  the gram table is built CLUSTERED + BLOOMED on `g` from only part
   *  of q75's corpus, extended to the full corpus by two
   *  [[ext.TextAnalysis.spanGramIndexAppend]] waves (gram size from the
   *  PIN; freshness decided against a key-probed read), reclustered by
   *  [[ext.TextAnalysis.compactSpanGramIndex]], then q75's exact batch
   *  is served through
   *  [[ext.TextAnalysis.removeDuplicatedSpansIncrementalIndexed]] —
   *  batch grams key-probe the manifest instead of streaming the whole
   *  index through the membership join. Pruning is conservative file
   *  skipping over a pure-membership side, so q75's oracle applies
   *  VERBATIM: a missed append, a compaction that lost a gram, or an
   *  over-eager prune lets a corpus span survive (or cuts a fresh one)
   *  and fails the hash. Flat-vs-indexed identity ExtSpec-pinned. */
  private val builtSpanIndex = scala.collection.concurrent.TrieMap[
    String, graft.tables.SnapshotTable]()
  private def indexedSpanServeQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val batch = docs.filter(col("doc_id") >= 250)
    val index = builtSpanIndex.getOrElseUpdate(dir, {
      val t = ext.PhaseLog.timed("build")(ext.TextAnalysis.buildSpanGramIndexTable(s,
        trackedTempDir("graft_q126_idx").toString,
        docs.filter(col("doc_id") < 150), "doc_id", "text", n = 10))
      ext.PhaseLog.timed("append")(ext.TextAnalysis.spanGramIndexAppend(t,
        docs.filter(col("doc_id") >= 150 && col("doc_id") < 200),
        "doc_id", "text"))
      ext.PhaseLog.timed("append")(ext.TextAnalysis.spanGramIndexAppend(t,
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 250),
        "doc_id", "text"))
      ext.PhaseLog.timed("compact")(ext.TextAnalysis.compactSpanGramIndex(t))
      t
    })
    ext.PhaseLog.timed("serve_probe")(
      ext.TextAnalysis.removeDuplicatedSpansIncrementalIndexed(
        index, batch, "doc_id", "text"))
      .orderBy("doc_id")
  }

  /** Q125 — STREAMING INDEXED dedup ingest
   *  ([[graft.streaming.StreamIngest.indexedDedupIngestSink]] — q114's
   *  streaming-ingest shape over the PERSISTED key-probed index, the
   *  production steady state at index sizes where the flat sink's
   *  per-batch full index scan stops being payable): the index pair is
   *  built on the even docs, a source table takes THREE commits —
   *  (corpus copies + fresh1), (resends of fresh1 + fresh2), (resends
   *  of fresh2 + fresh3) — replayed as paced micro-batches. Copies must
   *  drop against the BUILT index; each resend wave must drop against
   *  rows APPENDED by the previous batch (the cross-batch index-growth
   *  proof); every fresh wave must land. The oracle replays all six id
   *  classes as constants; a lost index append, a batch applied twice,
   *  or a serve missing appended files all shift the landed set and
   *  fail the hash. `paced_batches` structurally asserts one stream
   *  commit per source version on BOTH the data table and the signature
   *  index. */
  private val streamIndexedCache = scala.collection.concurrent.TrieMap[
    String, (graft.tables.SnapshotTable, graft.tables.SnapshotTable)]()
  private def streamIndexedDedupQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def freshText(tag: String, d: Column): Column =
      format_string(s"${tag}a%d ${tag}b%d ${tag}c%d ${tag}d%d ${tag}e%d",
        d, d, d, d, d)
    val (landed, sigT) = streamIndexedCache.getOrElseUpdate(dir, {
      val tmp = trackedTempDir("graft_q125_idx")
      val (bandT, sigT) = ext.Dedup.buildMinhashIndexTables(s,
        s"$tmp/bands", s"$tmp/sigs", docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      val d = col("doc_id")
      val b1 = docs.filter(d % 8 === 0)
          .select((d + lit(PlantShift)).as("doc_id"), col("text"))
        .unionByName(docs.filter(d % 8 === 2)
          .select((d + lit(2L * PlantShift)).as("doc_id"),
            freshText("vq", d).as("text")))
      val b2 = docs.filter(d % 8 === 2)
          .select((d + lit(3L * PlantShift)).as("doc_id"),
            freshText("vq", d).as("text")) // resend of fresh1 content
        .unionByName(docs.filter(d % 8 === 6)
          .select((d + lit(4L * PlantShift)).as("doc_id"),
            freshText("wq", d).as("text")))
      val b3 = docs.filter(d % 8 === 6)
          .select((d + lit(5L * PlantShift)).as("doc_id"),
            freshText("wq", d).as("text")) // resend of fresh2 content
        .unionByName(docs.filter(d % 8 === 4)
          .select((d + lit(6L * PlantShift)).as("doc_id"),
            freshText("xq", d).as("text")))
      val src = SnapshotTable.create(s,
        trackedTempDir("graft_q125s").toString, b1)
      src.append(b2)
      src.append(b3)
      val landed = SnapshotTable(s,
        trackedTempDir("graft_q125d").toString)
      val ckpt = trackedTempDir("graft_q125k").toString
      (1 to 3).foreach { _ =>
        val stream = s.readStream.format("graft-table")
          .option("path", src.root)
          .option("maxVersionsPerTrigger", "1")
          .load()
        graft.streaming.StreamIngest.runOnce(
          graft.streaming.StreamIngest.indexedDedupIngestSink(
            stream, landed, bandT, sigT, "doc_id", "text"), ckpt)
      }
      (landed, sigT)
    })
    val paced =
      landed.history().count(_.action.startsWith("stream-")) == 3 &&
        sigT.history().count(_.action.startsWith("stream-")) == 3
    val d = col("doc_id")
    val streamed = docs.filter(d % 8 === 0)
        .select(d.as("base_id"), (d + lit(PlantShift)).as("sid"),
          lit("copy").as("cls"))
      .unionByName(docs.filter(d % 8 === 2)
        .select(d.as("base_id"), (d + lit(2L * PlantShift)).as("sid"),
          lit("fresh1").as("cls")))
      .unionByName(docs.filter(d % 8 === 2)
        .select(d.as("base_id"), (d + lit(3L * PlantShift)).as("sid"),
          lit("resend1").as("cls")))
      .unionByName(docs.filter(d % 8 === 6)
        .select(d.as("base_id"), (d + lit(4L * PlantShift)).as("sid"),
          lit("fresh2").as("cls")))
      .unionByName(docs.filter(d % 8 === 6)
        .select(d.as("base_id"), (d + lit(5L * PlantShift)).as("sid"),
          lit("resend2").as("cls")))
      .unionByName(docs.filter(d % 8 === 4)
        .select(d.as("base_id"), (d + lit(6L * PlantShift)).as("sid"),
          lit("fresh3").as("cls")))
    streamed
      .join(landed.read().select(col("doc_id").as("sid"))
        .withColumn("sv", lit(1)), Seq("sid"), "left")
      .select(col("base_id").as("doc_id"), col("cls"),
        col("sv").isNotNull.as("survived"),
        lit(paced).as("paced_batches"))
      .orderBy("cls", "doc_id")
  }
  private val Q125Duck =
    """WITH cls AS (
      |  SELECT doc_id, 'copy' AS cls, FALSE AS survived
      |  FROM documents WHERE doc_id % 8 = 0
      |  UNION ALL SELECT doc_id, 'fresh1', TRUE
      |  FROM documents WHERE doc_id % 8 = 2
      |  UNION ALL SELECT doc_id, 'resend1', FALSE
      |  FROM documents WHERE doc_id % 8 = 2
      |  UNION ALL SELECT doc_id, 'fresh2', TRUE
      |  FROM documents WHERE doc_id % 8 = 6
      |  UNION ALL SELECT doc_id, 'resend2', FALSE
      |  FROM documents WHERE doc_id % 8 = 6
      |  UNION ALL SELECT doc_id, 'fresh3', TRUE
      |  FROM documents WHERE doc_id % 8 = 4)
      |SELECT doc_id, cls, survived, TRUE AS paced_batches
      |FROM cls ORDER BY cls, doc_id""".stripMargin

  /** Q66 — incremental near-dup dedup ([[ext.Dedup.minhashSignatures]] /
   *  [[ext.Dedup.minhashPairsIncremental]] / [[ext.Dedup.dedupIncremental]]),
   *  structurally oracled (q49 technique): the corpus index is the even
   *  docs; the batch mixes planted copies of every 4th doc (MUST match
   *  the corpus and be dropped) with synthetic fresh docs whose
   *  id-derived tokens cannot reach the 0.5 MinHash threshold against
   *  natural text (MUST survive). DuckDB replays both as constants over
   *  the two id classes. Raw pair lists stay ExtSpec-covered. */
  private def incrementalDedupQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    // the persistable index AS PERSISTED STATE: built once per scale dir
    // into a snapshot table (the steady-state incremental-ingest shape —
    // signatures outlive the session and every batch probes the stored
    // table), so the measured query is the true serving cost: read the
    // index, mine the batch. Replaces a per-run rebuild+localCheckpoint
    // that also leaked its blocks.
    val index = warmTable("minhash_index", dir) {
      SnapshotTable.create(s,
        trackedTempDir("graft_minhash_index").toString,
        ext.Dedup.minhashSignatures(corpus, "doc_id", "text"))
    }.read()
    val copies = docs.filter(col("doc_id") % 4 === 0)
      .select(shiftedId(col("doc_id")).as("doc_id"), col("text"))
    // fresh docs in a third id range ([2·shift, 3·shift)); five tokens
    // baked from the id give 3 shingles sharing nothing with any corpus
    // doc — far below any est_jaccard >= 0.5 collision
    val fresh = docs.filter(col("doc_id") % 4 === 2)
      .select((shiftedId(col("doc_id")) + lit(PlantShift)).as("doc_id"),
        format_string("zqa%d zqb%d zqc%d zqd%d zqe%d",
          col("doc_id"), col("doc_id"), col("doc_id"), col("doc_id"),
          col("doc_id")).as("text"))
    val batch = copies.unionByName(fresh)
    // mine the pair list ONCE; both consumers (corpus-hit audit and the
    // survivor filter) read the same checkpointed frame instead of
    // paying the band join + confirmation twice
    val pairs = ext.Dedup
      .minhashPairsIncremental(index, batch, "doc_id", "text", minEst = 0.5)
    val corpusFound = pairs
      .filter(col("in_corpus"))
      .select(col("id_a").as("doc_id")).distinct().withColumn("cf", lit(1))
    val survived = ext.Dedup
      .dedupIncrementalFromPairs(pairs, batch, "doc_id")
      .select(col("doc_id")).withColumn("sv", lit(1))
    batch.select(col("doc_id"))
      .join(corpusFound, Seq("doc_id"), "left")
      .join(survived, Seq("doc_id"), "left")
      .select(
        when(col("doc_id") >= 2L * PlantShift, col("doc_id") - 2L * PlantShift)
          .otherwise(col("doc_id") - PlantShift).as("doc_id"),
        (col("doc_id") < 2L * PlantShift).as("is_copy"),
        col("cf").isNotNull.as("corpus_dup_found"),
        col("sv").isNotNull.as("survived"))
      .orderBy("doc_id")
  }
  private val Q66Duck =
    """SELECT doc_id, true AS is_copy, true AS corpus_dup_found, false AS survived
      |FROM documents WHERE doc_id % 4 = 0
      |UNION ALL
      |SELECT doc_id, false, false, true FROM documents WHERE doc_id % 4 = 2
      |ORDER BY doc_id""".stripMargin

  /** Q43 — Z-order clustered snapshot + stats-pruned scan: cluster orders
   *  along the (o_custkey, o_orderkey) Morton curve, commit, point-scan
   *  on the clustered key. Oracle = the plain filter. */
  private def zorderQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val table = warmTable("q43", dir)(SnapshotTable.create(s,
      trackedTempDir("graft_q43").toString,
      ext.ZOrder.cluster(orders, Seq("o_custkey", "o_orderkey"), numFiles = 16)))
    table.scan(col("o_custkey") === 103)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }
  private val Q43Duck =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey = 103 ORDER BY o_orderkey""".stripMargin

  /** Q44 — end-to-end near-dup dedup: MinHash pair mining → connected
   *  components (transitive groups) → min-id survivor per group. The
   *  oracle replays it exactly: exact-Jaccard pairs (the fixture's
   *  planted dups are cleanly separated, see q25) + a recursive-CTE
   *  transitive closure + NOT IN losers. */
  private def dedupEndToEndQuery(s: SparkSession, dir: String): DataFrame =
    ext.Dedup.dedupNearDuplicates(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", minEst = 0.5)
      .select(col("doc_id"))
      .orderBy("doc_id")
  private val Q44Duck =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                                for i in range(1, len(t)-1)]) AS shingles
      |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)),
      |ex AS (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
      |allpairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |         any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |np AS (SELECT id_a, id_b FROM allpairs WHERE inter*1.0/(na+nb-inter) >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM np
      |          UNION SELECT id_b, id_a FROM np),
      |conn(a, b) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT c.a, e.dst FROM conn c JOIN edges e ON c.b = e.src),
      |losers AS (SELECT a AS doc_id FROM conn GROUP BY a HAVING MIN(b) < a)
      |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------------

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    registerViews(spark, "/root/testdata/sf0.001")
    spark.sql(Q11)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_projection" -> q(Q01),
    "q02_point_lookup" -> q(Q02),
    "q03_md5_checksum" -> q(Q03),
    "q04_join_equi_theta" -> q(Q04),
    "q05_join_sql" -> q(Q05),
    "q06_union_distinct" -> q(Q06),
    "q07_union_all_byname" -> q(Q07),
    "q08_lead_window" -> q(Q08),
    "q09_case_window" -> q(Q09),
    "q10_cte_scd2_shape" -> q(Q10),
    "q11_agg" -> q(Q11),
    "q12_join_agg_topk" -> q(Q12),
    "q13_semi_join" -> q(Q13),
    "q14_anti_join" -> q(Q14),
    "q15_count" -> q(Q15),
    "q16_json_get" -> q(Q16Spark),
    "q17_text_agg" -> q(Q17),
    "q18_scd2_merge" -> ((s, dir) => scd2MergeResult(s, dir)),
    "q19_snapshot_point_lookup" -> ((s, dir) => snapshotPointLookup(s, dir)),
    "q20_exact_dedup" -> exactDedupQuery,
    "q21_jaccard_neardup" -> jaccardQuery,
    "q22_cosine_topk" -> cosineTopKQuery,
    "q23_text_stats" -> textStatsQuery,
    "q24_langid" -> langIdQuery,
    "q25_minhash_neardup" -> minhashQuery,
    "q26_simhash_neardup" -> simhashQuery,
    "q27_multimodal_decode" -> multimodalQuery,
    "q28_fingerprint_simhash" -> fingerprintQuery,
    "q29_lsh_topk" -> lshTopKQuery,
    "q30_ddl_external_table" -> ddlQuery,
    "q31_catalog_roundtrip" -> catalogRoundTrip,
    "q32_asof_join" -> asofQuery,
    "q33_range_join" -> rangeQuery,
    "q34_rollup" -> q(Q34),
    "q35_setops" -> q(Q35),
    "q36_percentile" -> q(Q36),
    "q37_pivot" -> pivotQuery,
    "q38_sessions" -> q(Q38),
    "q39_cube_grouping" -> q(Q39),
    "q40_event_span" -> q(Q40Spark),
    "q41_hudi_upsert" -> ((s, dir) => hudiUpsertResult(s, dir)),
    "q42_mor_read" -> ((s, dir) => morReadResult(s, dir)),
    "q43_zorder_scan" -> zorderQuery,
    "q44_dedup_end_to_end" -> dedupEndToEndQuery,
    "q45_ivf_topk" -> ivfTopKQuery,
    "q46_quality_score" -> qualityQuery,
    "q47_text_ratios" -> textRatiosQuery,
    "q48_embedding_pairs" -> embeddingPairsQuery,
    "q49_approx_recall" -> approxRecallQuery,
    "q50_repetition_ratio" -> repetitionQuery,
    "q51_pii_scrub" -> scrubQuery,
    "q52_mix_sample" -> mixSampleQuery,
    "q53_chunking" -> chunkQuery,
    "q54_decontaminate" -> decontamQuery,
    "q55_change_feed" -> cdfQuery,
    "q56_domain_cap" -> capPerSourceQuery,
    "q57_seq_packing" -> packQuery,
    "q58_kmv_distinct" -> kmvQuery,
    "q59_vocabulary" -> vocabQuery,
    "q60_top_items" -> topItemsQuery,
    "q61_pack_sequences" -> packSeqQuery,
    "q62_dup_ngram_frac" -> dupSpanQuery,
    "q63_split_assign" -> splitQuery,
    "q64_mor_delete" -> morDeleteResult,
    "q65_epoch_shuffle" -> epochShuffleQuery,
    "q66_incremental_dedup" -> incrementalDedupQuery,
    "q67_ivf_stored" -> ivfStoredQuery,
    "q68_semdedup" -> semDedupQuery,
    "q69_bloom_lookup" -> bloomLookupQuery,
    "q70_replace_where" -> replaceWhereQuery,
    "q71_span_removal" -> spanRemovalQuery,
    "q72_bm25_search" -> bm25Query,
    "q73_quality_filter" -> qualityFilterQuery,
    "q74_random_projection" -> randomProjQuery,
    "q75_incremental_span" -> incrementalSpanQuery,
    "q76_unigram_logprob" -> unigramLpQuery,
    "q77_branch_wap" -> branchWapQuery,
    "q78_stream_roundtrip" -> streamRoundtripQuery,
    "q79_int8_topk" -> quantizedTopKQuery,
    "q80_budget_sample" -> budgetSampleQuery,
    "q81_stream_window" -> streamWindowQuery,
    "q82_dsir_weights" -> dsirQuery,
    "q83_dsir_sample" -> dsirSampleQuery,
    "q84_ivf_sq8" -> ivfQuantizedQuery,
    "q85_dv_delete" -> dvDeleteQuery,
    "q86_dv_update" -> dvUpdateQuery,
    "q87_ivf_pq" -> ivfPqQuery,
    "q88_linear_score" -> linearScoreQuery,
    "q89_audio_decode" -> audioDecodeQuery,
    "q90_bigram_logprob" -> bigramLpQuery,
    "q91_session_window" -> sessionWindowQuery,
    "q92_pmi_collocations" -> pmiQuery,
    "q93_video_decode" -> videoDecodeQuery,
    "q94_copy_into" -> copyIntoQuery,
    "q95_sketch_cube" -> sketchCubeQuery,
    "q96_bpe_encode" -> bpeEncodeQuery,
    "q97_hard_negatives" -> hardNegativesQuery,
    "q98_semantic_decontam" -> semanticDecontamQuery,
    "q99_pipeline" -> pipelineQuery,
    "q100_bpe_train" -> bpeTrainQuery,
    "q101_mor_faces" -> morFacesQuery,
    "q102_embedding_pairs_auto" -> embeddingPairsAutoQuery,
    "q103_rrf_fusion" -> rrfFuseQuery,
    "q104_dedup_lines" -> dedupLinesQuery,
    "q105_contam_report" -> overlapReportQuery,
    "q106_temperature_mix" -> temperatureMixQuery,
    "q107_length_percentiles" -> q(Q107),
    "q108_fim_transform" -> fimQuery,
    "q109_quantile_sketch" -> quantileSketchQuery,
    "q110_kmv_estimator" -> kmvEstimatorQuery,
    "q111_manifest_external" -> manifestExternalQuery,
    "q112_merge_evolution" -> mergeEvolutionQuery,
    "q113_catalog_persistence" -> catalogPersistenceQuery,
    "q114_stream_dedup" -> streamDedupQuery,
    "q115_apply_changes" -> applyChangesQuery,
    "q116_image_neardup" -> perceptualHashQuery,
    "q117_serve_indexed" -> indexedServeQuery,
    "q118_ivf_indexed" -> ivfIndexedQuery,
    "q119_ivf_sq8_indexed" -> ivfSq8IndexedQuery,
    "q120_ivf_pq_indexed" -> ivfPqIndexedQuery,
    "q121_ivf_stream" -> ivfStreamQuery,
    "q122_vacuum_retention" -> vacuumRetentionQuery,
    "q123_kll_envelope" -> kllEnvelopeQuery,
    "q124_index_maintenance" -> indexMaintenanceQuery,
    "q125_stream_indexed_dedup" -> streamIndexedDedupQuery,
    "q126_span_serve_indexed" -> indexedSpanServeQuery,
    "q127_spj_join" -> spjJoinQuery,
    "q128_spj_hybrid" -> spjHybridQuery,
    "q129_dpp_join" -> dppJoinQuery,
    "q130_topn" -> topnQuery,
    "q131_dpp_bucketed" -> dppBucketedQuery,
    "q132_meta_groupby" -> metaGroupByQuery,
    "q133_spj_string_hybrid" -> spjStringHybridQuery,
    "q134_meta_string_groupby" -> metaStringGroupByQuery,
    "q135_meta_time_groupby" -> metaTimeGroupByQuery,
    "q136_contact_pipeline" -> contactPipelineQuery,
    "q137_meta_trunc_groupby" -> metaTruncGroupByQuery,
    "q138_trunc_filter" -> truncFilterQuery,
    "q139_meta_mixed_groupby" -> metaMixedGroupByQuery,
    "q140_meta_filtered_groupby" -> metaFilteredGroupByQuery,
    "q141_meta_mix_agg" -> metaMixAggQuery)

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q01_filter_projection" -> Q01,
    "q02_point_lookup" -> Q02,
    "q03_md5_checksum" -> Q03,
    "q04_join_equi_theta" -> Q04,
    "q05_join_sql" -> Q05,
    "q06_union_distinct" -> Q06,
    "q07_union_all_byname" -> Q07,
    "q08_lead_window" -> Q08,
    "q09_case_window" -> Q09,
    "q10_cte_scd2_shape" -> Q10,
    "q11_agg" -> Q11,
    "q12_join_agg_topk" -> Q12,
    "q13_semi_join" -> Q13,
    "q14_anti_join" -> Q14,
    "q15_count" -> Q15,
    "q16_json_get" -> Q16Duck,
    "q17_text_agg" -> Q17,
    "q18_scd2_merge" -> Q18Duck,
    "q19_snapshot_point_lookup" -> Q02,
    "q20_exact_dedup" -> Q20Duck,
    "q21_jaccard_neardup" -> Q21Duck,
    "q22_cosine_topk" -> Q22Duck,
    "q23_text_stats" -> Q23Duck,
    "q24_langid" -> Q24Duck,
    "q25_minhash_neardup" -> Q25Duck,
    "q26_simhash_neardup" -> Q26Duck,
    "q27_multimodal_decode" -> Q27Duck,
    "q28_fingerprint_simhash" -> Q28Duck,
    "q29_lsh_topk" -> Q29Duck,
    "q30_ddl_external_table" -> Q02,
    "q31_catalog_roundtrip" -> Q02,
    "q32_asof_join" -> Q32Duck,
    "q33_range_join" -> Q33Duck,
    "q34_rollup" -> Q34,
    "q35_setops" -> Q35,
    "q36_percentile" -> Q36,
    "q37_pivot" -> Q37Duck,
    "q38_sessions" -> Q38,
    "q39_cube_grouping" -> Q39,
    "q40_event_span" -> Q40Duck,
    "q41_hudi_upsert" -> Q41Duck,
    "q42_mor_read" -> Q42Duck,
    "q43_zorder_scan" -> Q43Duck,
    "q44_dedup_end_to_end" -> Q44Duck,
    "q45_ivf_topk" -> Q22Duck,
    "q46_quality_score" -> Q46Duck,
    "q47_text_ratios" -> Q47Duck,
    "q48_embedding_pairs" -> Q48Duck,
    "q49_approx_recall" -> Q49Duck,
    "q50_repetition_ratio" -> Q50Duck,
    "q51_pii_scrub" -> Q51Duck,
    "q52_mix_sample" -> Q52Duck,
    "q53_chunking" -> Q53Duck,
    "q54_decontaminate" -> Q54Duck,
    "q55_change_feed" -> Q55Duck,
    "q56_domain_cap" -> Q56Duck,
    "q57_seq_packing" -> Q57Duck,
    "q58_kmv_distinct" -> Q58Duck,
    "q59_vocabulary" -> Q59Duck,
    "q60_top_items" -> Q60Duck,
    "q61_pack_sequences" -> Q61Duck,
    "q62_dup_ngram_frac" -> Q62Duck,
    "q63_split_assign" -> Q63Duck,
    "q64_mor_delete" -> Q64Duck,
    "q65_epoch_shuffle" -> Q65Duck,
    "q66_incremental_dedup" -> Q66Duck,
    "q67_ivf_stored" -> Q22Duck,
    "q68_semdedup" -> Q48Duck,
    "q69_bloom_lookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey = 271 ORDER BY o_orderkey""".stripMargin,
    "q70_replace_where" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderdate < DATE '1997-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q71_span_removal" -> Q71Duck,
    "q72_bm25_search" -> Q72Duck,
    "q73_quality_filter" -> Q73Duck,
    "q74_random_projection" -> Q74Duck,
    "q75_incremental_span" -> Q75Duck,
    "q76_unigram_logprob" -> Q76Duck,
    "q77_branch_wap" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  true AS audit_rows_match, true AS main_isolated_pre_publish,
        |  true AS published_squash
        |FROM orders WHERE o_orderdate < DATE '1997-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
        |  true AS audit_rows_match, true AS main_isolated_pre_publish,
        |  true AS published_squash
        |FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q78_stream_roundtrip" ->
      """SELECT event_id, user_id, value * 2 AS value2, true AS paced_batches
        |FROM events WHERE event_type = 'click'
        |ORDER BY event_id""".stripMargin,
    "q79_int8_topk" -> Q79Duck,
    "q80_budget_sample" -> Q80Duck,
    "q81_stream_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q82_dsir_weights" -> Q82Duck,
    "q83_dsir_sample" -> Q83Duck,
    "q84_ivf_sq8" -> Q79Duck,
    "q85_dv_delete" -> Q85Duck,
    "q86_dv_update" -> Q86Duck,
    "q87_ivf_pq" -> Q87Duck,
    "q88_linear_score" -> Q88Duck,
    "q89_audio_decode" -> Q89Duck,
    "q90_bigram_logprob" -> Q90Duck,
    "q91_session_window" -> Q91Duck,
    "q92_pmi_collocations" -> Q92Duck,
    "q93_video_decode" -> Q93Duck,
    "q94_copy_into" -> Q94Duck,
    "q95_sketch_cube" -> Q95Duck,
    "q96_bpe_encode" -> Q96Duck,
    "q97_hard_negatives" -> Q97Duck,
    "q98_semantic_decontam" -> Q98Duck,
    "q99_pipeline" -> Q99Duck,
    "q100_bpe_train" -> Q100Duck,
    "q101_mor_faces" -> Q101Duck,
    // identical result set to q48 (planted copies collide under any LSH
    // geometry; the cos filter excludes every background pair exactly)
    "q102_embedding_pairs_auto" -> Q48Duck,
    "q103_rrf_fusion" -> Q103Duck,
    "q104_dedup_lines" -> Q104Duck,
    "q105_contam_report" -> Q105Duck,
    "q106_temperature_mix" -> Q106Duck,
    "q107_length_percentiles" -> Q107Duck,
    "q108_fim_transform" -> Q108Duck,
    "q109_quantile_sketch" -> Q109Duck,
    "q110_kmv_estimator" -> Q110Duck,
    "q111_manifest_external" -> Q111Duck,
    "q112_merge_evolution" -> Q112Duck,
    "q113_catalog_persistence" -> Q113Duck,
    "q114_stream_dedup" -> Q114Duck,
    "q115_apply_changes" -> Q115Duck,
    "q116_image_neardup" -> Q116Duck,
    // pruning is file-skipping only: the indexed serve answers q66's
    // exact scenario, so its oracle is q66's verbatim
    "q117_serve_indexed" -> Q66Duck,
    // exhaustive probing (nProbe = nlist) over build+append makes the
    // file-pruned table serve exact, so the q22 brute-force oracle
    // applies verbatim (q67's argument, extended over the append)
    "q118_ivf_indexed" -> Q22Duck,
    // same argument for the SQ8 lifecycle: exhaustive over build+append
    // = brute-force SQ8 over q84's doubled corpus, q84's oracle verbatim
    "q119_ivf_sq8_indexed" -> Q79Duck,
    // the PQ lifecycle keeps q87's STRUCTURAL oracle: refined top-1 is
    // the planted copy at cosine 1.0, regardless of build/append split
    "q120_ivf_pq_indexed" -> Q87Duck,
    // exhaustive probing over build+stream = the whole corpus, so the
    // q22 brute-force oracle applies verbatim (q118's argument with the
    // append half delivered by the streaming sink); paced_batches is
    // the structural stream-commit count
    "q121_ivf_stream" -> Q121Duck,
    // both faces replay from base data: head = all three mutations,
    // tag = the pinned post-update version; a too-eager reclaim breaks
    // the tag read (rows/hash), a no-op vacuum fails files_reclaimed
    "q122_vacuum_retention" -> Q122Duck,
    // the estimator's portable invariant is the rank-error envelope —
    // the booleans are computed exactly over the data in Spark and must
    // all come back TRUE; n ties each row to the real per-lang counts
    "q123_kll_envelope" -> Q123Duck,
    // serves q117's exact batch over a built→appended→compacted index,
    // so the q66 oracle applies verbatim — any maintenance divergence
    // (lost/duplicated/mis-signed rows) shifts the survivor set
    "q124_index_maintenance" -> Q66Duck,
    "q125_stream_indexed_dedup" -> Q125Duck,
    // q75's scenario served through the maintained key-probed gram
    // index — pruning is file-skipping over pure membership, so the
    // flat oracle applies verbatim
    "q126_span_serve_indexed" -> Q75Duck,
    "q127_spj_join" -> Q127Duck,
    "q128_spj_hybrid" -> Q128Duck,
    "q129_dpp_join" -> Q129Duck,
    "q130_topn" -> Q130Duck,
    "q131_dpp_bucketed" -> Q131Duck,
    "q132_meta_groupby" -> Q132Duck,
    "q133_spj_string_hybrid" -> Q133Duck,
    "q134_meta_string_groupby" -> Q134Duck,
    "q135_meta_time_groupby" -> Q135Duck,
    "q136_contact_pipeline" -> Q136Duck,
    "q137_meta_trunc_groupby" -> Q137Duck,
    "q138_trunc_filter" -> Q138Duck,
    "q139_meta_mixed_groupby" -> Q139Duck,
    "q140_meta_filtered_groupby" -> Q140Duck,
    "q141_meta_mix_agg" -> Q141Duck)
  // q26/q28/q29 emit structural ground-truth columns (planted-copy
  // recall, decomposition invariance, collide-exactly-on-text-equality,
  // re-rank exactness) rather than raw 64-bit hashes — the q49 technique
  // inlined per query, so every declared query is DuckDB-oracled; the
  // raw hash/neighbor values stay covered by graft.ext.ExtSpec.
}
