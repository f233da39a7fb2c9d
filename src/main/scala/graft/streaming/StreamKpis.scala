package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Streaming KPI queries (SURVEY.md §2.10, §2.4 A3, §2.5 W6).
  *
  * The reference accumulates every batch client-side and recomputes all
  * KPIs from scratch per tick (`viz.py:742-803`). Here each KPI is
  * INCREMENTAL:
  *   - [[running]]: running global stats via a streaming aggregation
  *     (complete mode) — state is one row per feature, not the stream;
  *   - [[sliding]]: watermarked sliding event-time windows;
  *   - [[trailingPerUser]]: exact trailing-window-from-LATEST-EVENT
  *     semantics (`viz.py:783-789` anchors at `df.index[-1]`, not wall
  *     clock) via `mapGroupsWithState` — per-user state holds only events
  *     inside the trailing window (pruned each batch), so state size is
  *     bounded by window span × event rate, independent of stream length.
  */
object StreamKpis {

  /** Running (since stream start) stats; use outputMode("complete"). */
  def running(stream: DataFrame, groupCol: String, valueCol: String): DataFrame =
    stream.groupBy(col(groupCol)).agg(
      avg(col(valueCol)).as("avg_value"),
      min(col(valueCol)).as("min_value"),
      max(col(valueCol)).as("max_value"),
      count(lit(1)).as("n"))

  /** Sliding event-time windows with late-data bound; append mode. */
  def sliding(stream: DataFrame, tsCol: String, valueCol: String,
              window: String, slide: String, watermark: String = "0 seconds"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window, slide))
      .agg(avg(col(valueCol)).as("avg_value"), count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("avg_value"), col("n"))

  final case class Point(userId: Long, tsUs: Long, value: Double)
  final case class TrailingState(points: List[Point])
  final case class TrailingKpi(userId: Long, lastTsUs: Long, avgValue: Double,
                               minValue: Double, maxValue: Double, n: Long)

  /** Per-user trailing KPIs over `[maxSeenTs − windowSec, maxSeenTs]`. */
  def trailingPerUser(points: Dataset[Point], windowSec: Long)(
      implicit kpiEnc: org.apache.spark.sql.Encoder[TrailingKpi],
      stEnc: org.apache.spark.sql.Encoder[TrailingState]): Dataset[TrailingKpi] = {
    val winUs = windowSec * 1000000L
    points.groupByKey(_.userId)(org.apache.spark.sql.Encoders.scalaLong)
      .mapGroupsWithState[TrailingState, TrailingKpi] {
        (userId: Long, batch: Iterator[Point], state: GroupState[TrailingState]) =>
          val prev = state.getOption.map(_.points).getOrElse(Nil)
          val all = prev ++ batch.toList
          val maxTs = all.map(_.tsUs).max
          val kept = all.filter(_.tsUs >= maxTs - winUs).sortBy(_.tsUs)
          state.update(TrailingState(kept))
          val vs = kept.map(_.value)
          TrailingKpi(userId, maxTs, vs.sum / vs.size, vs.min, vs.max, vs.size.toLong)
      }
  }
}
