package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.scd2.Scd2
import graft.tables.SnapshotTable

/**
 * Example / smoke CLI: replays the reference's end-to-end SCD2 workflow
 * (initial load + incremental merge on its shipped contact CSVs,
 * `hudi/hudi_scd_script.py`) against a native [[SnapshotTable]], then runs
 * the reference's Athena golden query (`README.md:153`).
 *
 * Usage: runMain graft.Scd2Demo [hudi|iceberg|delta] [tableRoot]
 */
object Scd2Demo {
  def main(args: Array[String]): Unit = {
    val algo = args.headOption.getOrElse("hudi")
    val root = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("contact_table").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-scd2-demo")
      .withExtensions(new graft.sql.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-02-01 00:00:00")
    val initial = Scd2.readContactsCsv(spark, "/root/reference/data/initial_contacts.csv")
    val update = Scd2.readContactsCsv(spark, "/root/reference/data/update_contacts.csv")

    val table = Scd2.initialLoad(spark, root, initial, t0, withTs = algo != "delta")
    println(s"initial load: ${table.read().count()} rows, version ${table.currentVersion()}")

    algo match {
      case "hudi" =>
        val c = Scd2.hudiStyleMerge(table, update, t1)
        println(s"stage counts: initial=${c.initial} staged=${c.staged} toExpire=${c.toExpire} union=${c.union}")
      case "iceberg" => Scd2.icebergStyleMerge(table, update, t1)
      case "delta" => Scd2.deltaStyleMerge(table, update, t1)
      case "sql" =>
        // the reference's LITERAL SQL (iceberg/iceberg_scd_script.py:54-82),
        // table names adapted, running through GraftExtensions' MERGE rule
        graft.sql.GraftCatalog.register("iceberg_contact", table)
        Scd2.stage(update, t1).createOrReplaceTempView("iceberg_contact_update")
        val contactUpdateQry = """
          WITH contact_to_update AS (
                SELECT target.*
                FROM iceberg_contact AS target
                JOIN iceberg_contact_update AS source
                ON target.id = source.id
                WHERE target.checksum != source.checksum
                  AND target.iscurrent = 1
              UNION
                SELECT * FROM iceberg_contact_update
          ),contact_updated AS (
              SELECT *, LEAD(valid_from) OVER (PARTITION BY id ORDER BY valid_from) AS eff_from
              FROM contact_to_update
          )
          SELECT id,name,email,state,ts,valid_from,
              CAST(COALESCE(eff_from, null) AS Timestamp) AS valid_to,
              CASE WHEN eff_from IS NULL THEN 1 ELSE 0 END AS iscurrent,
              checksum
          FROM contact_updated
        """
        spark.sql(s"""
          MERGE INTO iceberg_contact tgt
          USING ($contactUpdateQry) src
          ON tgt.id = src.id
          AND tgt.checksum = src.checksum
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
        """)
      case other => sys.error(s"unknown algorithm: $other")
    }
    println(s"after merge: ${table.read().count()} rows, version ${table.currentVersion()}")
    println(s"time travel v0: ${table.readVersion(0).count()} rows")
    println(s"manifest: ${table.manifest().size} files")

    table.registerView("contact")
    println("golden query: select ... from contact where id = 103")
    spark.sql(
      """select id, state, iscurrent, valid_from, valid_to, substring(checksum, 1, 8) as checksum8
        |from contact where id = 103 order by iscurrent""".stripMargin).show(false)

    val perIdCurrent = table.read().filter(col("iscurrent") === 1)
      .groupBy("id").count().filter(col("count") =!= 1).count()
    println(s"ids with != 1 current row: $perIdCurrent")
    spark.stop()
  }
}
