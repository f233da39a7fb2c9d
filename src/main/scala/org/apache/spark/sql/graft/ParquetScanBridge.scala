package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into the `private[sql]` DataSourceV2 parquet scan machinery, for
  * streaming sources that plan each micro-batch as a REAL distributed
  * parquet scan (file listing, row-group pruning via pushed filters,
  * executor-side readers) instead of shipping driver-collected rows.
  * Same access-modifier rationale as [[CatalystBridge]].
  */
object ParquetScanBridge {

  /** One file listing for a static table, reused across micro-batches
    * (a replayed history does not change while a query runs).
    */
  def fileIndex(spark: SparkSession, path: String): PartitioningAwareFileIndex = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new InMemoryFileIndex(cs, Seq(new Path(path)), Map("path" -> path), None)
  }

  /** Plan one batch scan over `path` with `filters` pushed down: returns
    * the file partitions and Spark's own parquet reader factory for them.
    * Filters are catalyst predicates over the table's columns; whatever
    * the parquet source cannot translate is simply not pushed (the caller
    * must keep row-level enforcement on its side regardless — pushdown is
    * pruning, not truth).
    */
  def parquetBatch(spark: SparkSession, index: PartitioningAwareFileIndex,
                   schema: StructType, filters: Seq[Expression])
      : (Array[InputPartition], PartitionReaderFactory) = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val opts = new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    val builder = ParquetScanBuilder(cs, index, schema, schema, opts)
    builder.pushFilters(filters)
    val batch = builder.build().toBatch
    (batch.planInputPartitions(), batch.createReaderFactory())
  }
}
