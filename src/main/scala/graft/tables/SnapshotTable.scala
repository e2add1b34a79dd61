package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.util.UUID

/**
 * Snapshot-versioned Parquet table with an atomic file-system commit log —
 * the native replacement for the transactional-table capability the
 * reference outsources to Hudi/Iceberg/Delta (reference:
 * `hudi/hudi_scd_script.py:30-49`, `iceberg/iceberg_scd_script.py:34-37`,
 * `delta/delta_scd_script.py:37-43`; see SURVEY.md §7.2).
 *
 * Layout under `root`:
 * {{{
 *   _log/00000000000000000001.json   commit entries (version-ordered)
 *   data/<uuid>/part-*.parquet       immutable data directories
 * }}}
 *
 * Each commit entry records the **explicit list of live parquet files**
 * (O(files) metadata, never O(rows) — SURVEY.md §4.3), the table schema,
 * and the action. Commit = write entry to a temp name, then
 * `FileSystem.rename` to `_log/<version>.json`; rename-to-existing fails on
 * HDFS-compatible filesystems, which makes the version slot a
 * compare-and-swap: a concurrent writer that loses the race gets a
 * [[ConcurrentCommitException]] (the local-FS stand-in for the reference's
 * DynamoDB optimistic lock, `hudi/hudi_scd_script.py:41-48`). Readers only
 * ever see fully-committed file lists, so overwrite/createOrReplace is
 * atomic (`iceberg/iceberg_scd_script.py:37` semantics), and orphaned data
 * dirs from failed writes are invisible and GC-able.
 *
 * Scale notes (100 TB target):
 *  - `append` commits only the new files — no rewrite, O(1) data moved.
 *  - `upsert`/`merge` (graft.ops) rewrite only *touched* files
 *    (copy-on-write at file granularity, like Delta's two-job MERGE,
 *    SURVEY.md §3.2) and carry the untouched file list forward.
 *  - All data movement happens in executors; the driver handles commit
 *    metadata only.
 */
class SnapshotTable private (
    val spark: SparkSession,
    val root: String) {

  import SnapshotTable._

  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
  private def logDir = new Path(rootPath, "_log")
  private def dataDir = new Path(rootPath, "data")

  /** Registered view names to refresh on every commit (catalog sync,
   *  reference `hoodie.datasource.hive_sync.*`, `hudi/hudi_scd_script.py:35-40`). */
  @volatile private var syncedViews: List[String] = Nil

  // ---------------------------------------------------------------- commits

  /** Latest committed version, or -1 if the table is empty/uninitialized. */
  def currentVersion(): Long = listVersions().lastOption.getOrElse(-1L)

  private def listVersions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Nil
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  private[graft] def commitEntry(version: Long): CommitEntry = {
    val p = new Path(logDir, f"$version%020d.json")
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      out.toByteArray
    } finally in.close()
    CommitEntry.fromJson(new String(bytes, "UTF-8"))
  }

  /** Atomically publish `entry` as version `version` (CAS on the slot). */
  private def writeCommit(version: Long, entry: CommitEntry): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID().toString.take(8)}.json")
    val out = fs.create(tmp, false)
    try out.write(entry.toJson.getBytes("UTF-8")) finally out.close()
    val dest = new Path(logDir, f"$version%020d.json")
    val renamed = !fs.exists(dest) && fs.rename(tmp, dest)
    if (!renamed) {
      fs.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"version $version of $root was committed concurrently")
    }
    refreshViews()
  }

  private def refreshViews(): Unit =
    syncedViews.foreach(v => read().createOrReplaceTempView(v))

  // ----------------------------------------------------------------- writes

  /** Write `df` into a fresh immutable data dir; return its parquet files. */
  private[graft] def writeDataDir(df: DataFrame): Seq[String] = {
    val dir = new Path(dataDir, UUID.randomUUID().toString.take(12))
    df.write.mode("overwrite").parquet(dir.toString)
    listParquet(dir)
  }

  private def listParquet(dir: Path): Seq[String] = {
    fs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.getPath)
      .sorted
  }

  /** Full-replace (reference "bulk insert overwrite" S4/S7,
   *  `hudi/hudi_scd_script.py:66-70`, `delta/delta_scd_script.py:37-39`). */
  def overwrite(df: DataFrame): SnapshotTable = {
    val files = writeDataDir(df)
    writeCommit(currentVersion() + 1,
      CommitEntry(files, df.schema.json, "overwrite"))
    this
  }

  /** Append-only commit: carries prior files forward, adds the new ones. */
  def append(df: DataFrame): SnapshotTable = {
    val v = currentVersion()
    val prior = if (v < 0) Nil else commitEntry(v).files
    val files = writeDataDir(df)
    writeCommit(v + 1, CommitEntry(prior ++ files, df.schema.json, "append"))
    this
  }

  /** Replace the live file set with `keep` plus newly-written `df` files —
   *  the copy-on-write commit used by upsert/merge (graft.ops). */
  private[graft] def replaceFiles(keep: Seq[String], df: DataFrame, action: String): SnapshotTable = {
    val files = writeDataDir(df)
    writeCommit(currentVersion() + 1,
      CommitEntry((keep ++ files).sorted, df.schema.json, action))
    this
  }

  // ------------------------------------------------------------------ reads

  /** Latest committed snapshot. Readers never observe partial writes. */
  def read(): DataFrame = readVersion(currentVersion())

  /** Time travel (reference formats' snapshot isolation made explicit). */
  def readVersion(version: Long): DataFrame = {
    require(version >= 0, s"table $root is empty")
    val entry = commitEntry(version)
    val schema = DataType.fromJson(entry.schemaJson).asInstanceOf[StructType]
    if (entry.files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(entry.files: _*)
  }

  def schema: StructType =
    DataType.fromJson(commitEntry(currentVersion()).schemaJson).asInstanceOf[StructType]

  /** Live file list of the current snapshot (the "manifest" — the analogue
   *  of Delta's symlink_format_manifest, `delta/delta_scd_script.py:42-43`). */
  def manifest(): Seq[String] = {
    val v = currentVersion()
    if (v < 0) Nil else commitEntry(v).files
  }

  /** Register as a temp view, refreshed on every subsequent commit. */
  def registerView(name: String): SnapshotTable = {
    syncedViews = name :: syncedViews.filterNot(_ == name)
    read().createOrReplaceTempView(name)
    this
  }

  // ------------------------------------------------------------- operations

  /** Hudi-semantics keyed upsert — see [[graft.ops.Upsert]]. */
  def upsert(incoming: DataFrame, keys: Seq[String], precombine: String): SnapshotTable =
    graft.ops.Upsert(this, incoming, keys, precombine)

  /** Delta/Iceberg-semantics MERGE INTO — see [[graft.ops.MergeInto]]. */
  def merge(source: DataFrame, condition: org.apache.spark.sql.Column): graft.ops.MergeInto =
    new graft.ops.MergeInto(this, source, condition)
}

object SnapshotTable {

  class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  /** A committed table state: live files + schema. Stored as one JSON file
   *  per version; kept dependency-free (hand-rolled JSON, flat strings). */
  private[graft] case class CommitEntry(files: Seq[String], schemaJson: String, action: String) {
    def toJson: String = {
      def q(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      s"""{"action":${q(action)},"files":[${files.map(q).mkString(",")}],"schema":${q(schemaJson)}}"""
    }
  }

  private[graft] object CommitEntry {
    // Minimal JSON reader for the writer above (strings have no raw quotes
    // besides escaped ones; schema JSON is stored as an escaped string).
    def fromJson(s: String): CommitEntry = {
      def unescape(x: String): String = {
        val sb = new StringBuilder
        var i = 0
        while (i < x.length) {
          val c = x.charAt(i)
          if (c == '\\' && i + 1 < x.length) {
            x.charAt(i + 1) match {
              case '"' => sb.append('"'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case 'n' => sb.append('\n'); i += 2
              case 'u' => sb.append(Integer.parseInt(x.substring(i + 2, i + 6), 16).toChar); i += 6
              case other => sb.append(other); i += 2
            }
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }
      // Tokenize top-level strings (quote-aware).
      def stringsAfter(key: String): Seq[String] = {
        val ki = s.indexOf("\"" + key + "\":")
        require(ki >= 0, s"missing $key in commit entry")
        var i = ki + key.length + 3
        val acc = scala.collection.mutable.ArrayBuffer[String]()
        var depth = 0
        var done = false
        while (i < s.length && !done) {
          s.charAt(i) match {
            case '[' => depth += 1; i += 1
            case ']' => depth -= 1; i += 1; if (depth <= 0) done = true
            case '"' =>
              val sb = new StringBuilder
              i += 1
              while (s.charAt(i) != '"') {
                if (s.charAt(i) == '\\') { sb.append(s.charAt(i)).append(s.charAt(i + 1)); i += 2 }
                else { sb.append(s.charAt(i)); i += 1 }
              }
              i += 1
              acc += unescape(sb.toString)
              if (depth == 0) done = true
            case _ => i += 1
          }
        }
        acc.toSeq
      }
      CommitEntry(
        files = stringsAfter("files"),
        schemaJson = stringsAfter("schema").head,
        action = stringsAfter("action").head)
    }
  }

  /** Open or initialize a table rooted at `root`. */
  def apply(spark: SparkSession, root: String): SnapshotTable =
    new SnapshotTable(spark, root)

  /** Create with an initial snapshot (createOrReplace,
   *  `iceberg/iceberg_scd_script.py:34-37`). */
  def create(spark: SparkSession, root: String, df: DataFrame): SnapshotTable =
    new SnapshotTable(spark, root).overwrite(df)
}
