package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.SparkSpec

/** Parquet bloom filters behind the `graft.bloom.columns` table property
 *  (row-group point-lookup skipping for high-cardinality columns). */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def bloomOffsets(file: String): Map[String, Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
    } finally reader.close()
  }

  test("graft.bloom.columns writes bloom filters for exactly those columns") {
    val t = SnapshotTable.create(spark, tmpDir("bloom"),
      (1 to 5000).map(i => (s"key$i", i, s"p$i")).toDF("k", "n", "payload"))
    t.setProperties(Map("graft.bloom.columns" -> "k, n"))
    t.overwrite((1 to 5000).map(i => (s"key$i", i, s"p$i")).toDF("k", "n", "payload"))
    val offsets = bloomOffsets(t.manifest().head)
    assert(offsets("k") >= 0, "k must carry a bloom filter")
    assert(offsets("n") >= 0, "n must carry a bloom filter")
    assert(offsets("payload") === -1L, "payload must not carry one")
    // reads stay correct with pushed equality predicates over bloom columns
    assert(t.scan(org.apache.spark.sql.functions.col("k") === "key4321")
      .select("n").as[Int].collect().toSeq === Seq(4321))
  }

  test("without the property no bloom filters are written") {
    val t = SnapshotTable.create(spark, tmpDir("bloom"),
      (1 to 100).map(i => (s"key$i", i)).toDF("k", "n"))
    assert(bloomOffsets(t.manifest().head).values.forall(_ === -1L))
  }

  test("unknown or malformed bloom column names are ignored, not fatal") {
    val t = SnapshotTable.create(spark, tmpDir("bloom"),
      (1 to 100).map(i => (s"key$i", i)).toDF("k", "n"))
    t.setProperties(Map("graft.bloom.columns" -> "no_such, , K"))
    t.append((101 to 200).map(i => (s"key$i", i)).toDF("k", "n"))
    // case-insensitive resolution: K → k; no_such silently skipped
    val offsets = bloomOffsets(t.manifest().last) // newest appended file
    assert(offsets("k") >= 0)
  }
}
