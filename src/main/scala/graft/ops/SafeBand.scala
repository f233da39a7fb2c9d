package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Safe-band anomaly density (SURVEY.md §2.5 W5 + §2.4 A8; reference
  * `viz.py:179-258` `add_aux_rectangles`).
  *
  * The safe band is `mean ± 2·stddev_samp` of the FULL series
  * (`viz.py:193-196`). The time axis is split into at least `minBuckets`
  * buckets of at least `minBucketSeconds` each (`viz.py:239-241`:
  * `max(range/600, 30s)`); each bucket reports how many rows fall outside
  * the band and its total row count (opacity = 0.7·ratio + 0.2 downstream).
  *
  * Scale shape: two passes over the series — a scalar aggregate (band +
  * bounds, 1 row, broadcast back) and one hash aggregation keyed by bucket
  * index. No window functions, no sort, no driver-side loop.
  */
object SafeBand {

  /** Alert flags (reference `ALERT_TIMEOUT`, `viz.py:38`): per user, count
    * out-of-band readings inside the trailing window anchored at the
    * stream's latest event; `alert` = any unsafe reading present. The band
    * comes from the FULL series (W5), the window from
    * [[SeriesOps.trailingWindow]] semantics.
    */
  def alertFlags(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
                 windowSeconds: Long): DataFrame = {
    val stats = df.agg(
      avg(col(valueCol)).as("__mean"), stddev_samp(col(valueCol)).as("__std"))
    val recent = graft.ops.SeriesOps.trailingWindow(df, tsCol, windowSeconds)
    recent.join(broadcast(stats))
      .withColumn("__unsafe",
        col(valueCol) < col("__mean") - lit(2.0) * col("__std") ||
          col(valueCol) > col("__mean") + lit(2.0) * col("__std"))
      .groupBy(col(userCol))
      .agg(
        sum(when(col("__unsafe"), 1L).otherwise(0L)).as("unsafe_in_window"),
        count(lit(1)).as("rows_in_window"))
      .withColumn("alert", col("unsafe_in_window") > 0)
  }

  def densityBuckets(df: DataFrame, tsCol: String, valueCol: String,
                     minBuckets: Int = 600, minBucketSeconds: Long = 30): DataFrame = {
    // Pass 1: global band + span (µs-integral arithmetic for oracle parity).
    val stats = df.agg(
      avg(col(valueCol)).as("__mean"),
      stddev_samp(col(valueCol)).as("__std"),
      min(unix_micros(col(tsCol))).as("__min_us"),
      max(unix_micros(col(tsCol))).as("__max_us")
    )

    // Bucket width: max(span/minBuckets, minBucketSeconds), in µs, integral.
    val withBand = df
      .join(broadcast(stats))
      .withColumn("__lo", col("__mean") - lit(2.0) * col("__std"))
      .withColumn("__hi", col("__mean") + lit(2.0) * col("__std"))
      .withColumn("__width_us",
        greatest((col("__max_us") - col("__min_us")).cast("double") / lit(minBuckets.toDouble),
          lit(minBucketSeconds * 1000000.0)))
      .withColumn("__bucket",
        floor((unix_micros(col(tsCol)) - col("__min_us")).cast("double") / col("__width_us"))
          .cast("long"))

    withBand
      .groupBy(col("__bucket").as("bucket"))
      .agg(
        sum(when(col(valueCol) < col("__lo") || col(valueCol) > col("__hi"), 1L)
          .otherwise(0L)).as("unsafe_rows"),
        count(lit(1)).as("total_rows")
      )
  }
}
