package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over event streams — time from a
  * start marker (e.g. signup) to a terminal event (e.g. churn/error),
  * right-censored at each user's last observed activity. The KM
  * product-limit estimator is THE standard retention/time-to-event
  * curve; its day-grid form here is what product analytics plots.
  *
  * Scale design: one events scan builds the per-user episode (start,
  * terminal-candidate list, last-seen) with per-user-bounded arrays;
  * everything after is day-grid-bounded (one row per distinct duration
  * day). The at-risk counts come from a running sum over that tiny
  * grid, and the survival product is `exp(Σ ln(1−d/n))` over the same
  * ordered frame — no per-user state survives the first aggregation.
  */
object Survival {

  /** Per-day KM table: (day, n_risk, d_events, c_censored, km).
    *
    * A user enters at their FIRST `startType` event; the episode ends at
    * the first `eventType` at-or-after the start (observed) or at the
    * user's last event of any type (censored). Duration is whole days
    * (floor). Users with no start event are excluded; a terminal event
    * BEFORE the start never matches (the array probe is `>= t0`).
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, startType: String,
                  eventType: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val episodes = events.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === startType, us)).as("__t0"),
        max(us).as("__last"),
        sort_array(collect_list(when(col(typeCol) === eventType, us)))
          .as("__evs"))
      .filter(col("__t0").isNotNull)
      .withColumn("__te",
        get(filter(col("__evs"), e => e >= col("__t0")), lit(0)))
      .select(col(userCol),
        (floor((coalesce(col("__te"), col("__last")) - col("__t0")) /
          lit(86400000000L))).as("day"),
        col("__te").isNotNull.as("observed"))
    val grid = episodes.groupBy(col("day"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d_events"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("c_censored"))
    val ord = Window.orderBy(col("day"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val total = sum(col("d_events") + col("c_censored"))
      .over(Window.partitionBy())
    // The day grid is bounded (≤ observation-span days), so the single
    // unpartitioned window here is a tiny-table sort, not a data sort.
    // A day where the entire remaining risk set dies (d == n) sends the
    // survival to EXACTLY 0 from that day on; it must not reach ln —
    // Spark's log(0) is null (silently freezing the curve) and DuckDB's
    // errors, so the zero factor is handled as an explicit cumulative
    // flag in both engines.
    val factor = lit(1.0) - col("d_events").cast("double") /
      col("n_risk").cast("double")
    grid
      .withColumn("n_risk", total - coalesce(
        sum(col("d_events") + col("c_censored")).over(prior), lit(0L)))
      .withColumn("__zero",
        max(when(factor <= 0, 1).otherwise(0)).over(cum))
      .withColumn("km", when(col("__zero") === 1, lit(0.0)).otherwise(
        round(exp(sum(when(factor > 0, log(factor))).over(cum)), 6)))
      .select(col("day"), col("n_risk"), col("d_events"),
        col("c_censored"), col("km"))
  }

}
