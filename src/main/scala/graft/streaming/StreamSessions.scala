package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based session aggregation on a stream via Spark's native
  * `session_window` — the streaming face of
  * [[graft.ops.SeriesOps.sessionize]]. The native operator keeps one
  * merging window per (user, open session) and EVICTS it once the event
  * watermark passes the session's close (gap elapsed), so state is
  * bounded by concurrently-open sessions — exactly the semantics the
  * batch sessionizer computes with its lag + running-sum windows.
  *
  * The same call works on a BATCH frame (no watermark needed there); the
  * spec pins that the per-session aggregates equal the batch
  * sessionizer's output, so the two faces are interchangeable: batch for
  * backfill, this for the live path, one definition of "session".
  */
object StreamSessions {

  /** Per-session aggregates: (user, start_us, end_us, n_events,
    * sum_value). On a stream, attach `withWatermark(tsCol, ...)` BEFORE
    * calling and run in append mode — sessions emit exactly once, when
    * the watermark closes them.
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               valueCol: String, gap: String): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), gap).as("__w"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"),
        round(sum(col(valueCol)), 4).as("sum_value"))
      .select(col(userCol), col("start_us"), col("end_us"),
        col("n_events"), col("sum_value"))
}
