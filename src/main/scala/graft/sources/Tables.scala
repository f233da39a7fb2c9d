package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical-table access layer over the driver's parquet testdata.
  *
  * One place that knows physical quirks (the events table's nanosecond
  * timestamps) so operators never do. At cluster scale this is where
  * bucketing/partitioning metadata would live; locally it is a plain
  * parquet scan that Catalyst pushes filters/projections into.
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  /** Load one canonical table from a scale-factor directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session-level escape hatch for TIMESTAMP(NANOS) parquet (events table);
    // must be set before schema conversion, i.e. before the read below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        // Normalize ts to a session-TZ TimestampType regardless of how the
        // generator wrote it: TIMESTAMP(NANOS) arrives as epoch-nanos Long
        // (integral division — a double round-trip would lose precision
        // above 2^53 ns), TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives
        // as TIMESTAMP_NTZ (same wall values under the UTC session TZ).
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => df
        }
      case _ => df
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
