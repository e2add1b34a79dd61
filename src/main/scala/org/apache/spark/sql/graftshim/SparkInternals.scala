package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Narrow bridge to `private[sql]` Spark internals the engine needs:
 * Column ⇄ Catalyst Expression (Spark 4 removed the public `Column.expr`)
 * and LogicalPlan → DataFrame. Lives under `org.apache.spark.sql` solely
 * for access; keep this surface minimal.
 */
object SparkInternals {
  /** v2 Column array → StructType (CatalogV2Util is `private[sql]`). */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(cols)

  /** Fully-converted Catalyst tree (ExpressionUtils.expression returns a
   *  lazy ColumnNodeExpression wrapper that hides the real node shapes). */
  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over a parquet [[org.apache.spark.sql.execution.datasources.FileIndex]]
   *  — the metadata-served read path: `spark.read.parquet(paths…)`
   *  re-stats every path through an InMemoryFileIndex (above 32 paths,
   *  a Spark LISTING JOB per call); a caller that already knows each
   *  file's exact length (the commit manifest) passes its own index and
   *  pays zero filesystem round trips at plan time. */
  def parquetOver(
      spark: SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = org.apache.spark.sql.types.StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel))
  }

  /** V2 runtime-filter Predicate → V1 source Filter (PredicateUtils is
   *  `private[sql]`) — what [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering.filter]]
   *  receives from dynamic partition pruning (an IN over the broadcast
   *  side's join keys), translated to the shape the engine's manifest
   *  pruning already consumes. None for shapes V1 cannot express —
   *  the caller must treat those as non-pruning, never as false. */
  def predicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)

  /** The DataFrame's analyzed logical plan (for returning a frame from a
   *  table-function builder, which must produce a LogicalPlan). */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Resolve a configured catalog plugin by name (`CatalogManager` is
   *  `private[sql]`); None when no such catalog is configured. */
  def catalogPlugin(spark: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name))
    catch { case _: org.apache.spark.sql.connector.catalog.CatalogNotFoundException => None }

  /** Executed (physical) plan string, for plan-shape assertions. */
  def executedPlanString(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString

  /** A V1 streaming Sink's `addBatch` DataFrame is bound to the query's
   *  own incremental execution and cannot be re-planned by batch writers;
   *  wrap its executed RDD in a fresh batch LogicalRDD (exactly what
   *  Spark's ForeachBatchSink does) so normal write paths can consume it. */
  def rebatch(data: DataFrame): DataFrame = {
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      classic.queryExecution.toRdd, classic, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(classic.sparkSession, node)
  }

  /** One [[org.apache.spark.sql.connector.read.InputPartition]] per
   *  bucket for a storage-partitioned-join scan: a FilePartition (so
   *  Spark's parquet PartitionReaderFactory consumes it unchanged) that
   *  also reports its bucket id as the KeyGroupedPartitioning partition
   *  key. `FilePartition`/`PartitionedFile` are `private[sql]`-adjacent
   *  execution classes — constructed here, behind the shim. */
  def keyedFilePartition(
      index: Int,
      files: Seq[(String, Long)], // (path, bytes)
      key: Seq[Any]): org.apache.spark.sql.connector.read.InputPartition = {
    import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
    val pfs = files.map { case (p, bytes) =>
      PartitionedFile(
        org.apache.spark.sql.catalyst.InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPath(new org.apache.hadoop.fs.Path(p)),
        0L, bytes, Array.empty[String], 0L, bytes)
    }.toArray
    val keyArray = key.toArray
    new FilePartition(index, pfs)
        with org.apache.spark.sql.connector.read.HasPartitionKey {
      override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(keyArray)
    }
  }

  /** Spark's reserved temporary column name that makes the parquet
   *  readers (vectorized AND parquet-mr — both wire
   *  `ParquetRowIndexUtil`) emit each row's physical position in its
   *  file. The SAME index domain `_metadata.row_index` exposes, which is
   *  what deletion-vector sidecars record — so a scan that requests this
   *  column can apply DV positions exactly. */
  def rowIndexColumnName: String =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** StructField for the temporary row-index column. NULLABLE on
   *  purpose: the readers' missing-column check throws on a required
   *  column absent from the file, and this column is intercepted by the
   *  row-index generators (never actually read from the file). Spark's
   *  own `ROW_INDEX_FIELD` carries the `_metadata.row_index` name, not
   *  the temporary request name, so it is built here instead. */
  def rowIndexField: org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(
      rowIndexColumnName, org.apache.spark.sql.types.LongType, nullable = true)

  /** The (file name, single-file partition) decomposition of a file-based
   *  [[org.apache.spark.sql.connector.read.InputPartition]] — None for
   *  non-file partitions. Lets a wrapping reader attribute rows to their
   *  file (deletion vectors are keyed by file name) while delegating the
   *  actual reading to the underlying parquet reader factory per file. */
  def filePartitionFiles(p: org.apache.spark.sql.connector.read.InputPartition)
      : Option[Seq[(String, org.apache.spark.sql.connector.read.InputPartition)]] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    p match {
      case fp: FilePartition =>
        Some(fp.files.toSeq.map(pf =>
          (pf.toPath.getName,
            FilePartition(fp.index, Array(pf))
              : org.apache.spark.sql.connector.read.InputPartition)))
      case _ => None
    }
  }

  /** Murmur3 (seed 42) of a catalyst-native value — EXACTLY the SQL
   *  `hash()` 32-bit result that both `ClusterTransform.expr`'s bucket
   *  value and `repartition(n, col)`'s partition index derive from; the
   *  V2 bucket function must agree bit-for-bit with both. */
  def murmur3Hash32(value: Any, dataType: org.apache.spark.sql.types.DataType): Int =
    murmur3Hash32(Seq(value), Seq(dataType))

  /** Chained murmur3 over several values — SQL `hash(a, b, …)` and the
   *  partition index of `repartition(n, a, b, …)`: each non-null value
   *  hashes with the running result as seed (NULLs leave it unchanged,
   *  the HashExpression convention), starting from 42. The V2 bucket
   *  function's composite-key evaluation must match both bit-for-bit. */
  def murmur3Hash32(
      values: Seq[Any],
      dataTypes: Seq[org.apache.spark.sql.types.DataType]): Int = {
    var h = 42L
    var i = 0
    while (i < values.length) {
      if (values(i) != null)
        h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(values(i), dataTypes(i), h)
      i += 1
    }
    h.toInt
  }

  /** The inverse marking of [[rebatch]]: wrap a batch plan's executed RDD
   *  as a single STREAMING leaf. A V1 streaming source must return an
   *  `isStreaming` plan, but marking the leaves of a multi-relation plan
   *  (joins/unions, e.g. a change-feed diff) would make the engine read
   *  it as a stream-stream join — wrapping the whole plan keeps it one
   *  leaf. The RDD is lazy; nothing executes until the batch runs. */
  def asStreamingLeaf(data: DataFrame): DataFrame = {
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      classic.queryExecution.toRdd, classic, isStreaming = true)
    org.apache.spark.sql.classic.Dataset.ofRows(classic.sparkSession, node)
  }
}
