package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop subset of [[graft.Verify]]: dump only the NAMED declared
  * queries, plus an oracle_sql.json FILTERED to those names, so a single
  * new query can be checked against DuckDB without re-running the suite.
  *
  * Usage: runMain graft.tools.RunQueries <sfDir> <outDir> <name> [name…]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RunQueries <sfDir> <outDir> <name>…")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[run] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[run] $name FAILED: ${e.getMessage}")
      }
    }
    graft.Verify.writeOracleJson(outDir,
      graft.SparkEntry.oracleSql.filter(o => names(o._1)))
    spark.stop()
  }
}
