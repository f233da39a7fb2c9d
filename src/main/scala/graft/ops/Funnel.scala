package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: windowed funnels and
  * cohort retention — the two canonical product-analytics reports
  * (ClickHouse windowFunnel / retention counterparts), re-expressed as
  * one-aggregation Spark plans.
  *
  * Scale design: both ops reduce to a SINGLE user-keyed aggregation
  * (map-side partial, one exchange on the even, unskewed user key). The
  * funnel collects per-stage timestamp arrays per user — bounded by a
  * user's own event count, the same per-user-bounded assumption every
  * window op here already makes — then resolves the chain with pure
  * array expressions (no UDF, no per-row join chain, no second scan).
  */
object Funnel {

  /** Greedy earliest-chain windowed funnel: per user, t1 = earliest
    * stage-1 event; each later stage matches its earliest event AFTER the
    * previous stage and within `windowSec` of t1. Greedy-earliest is the
    * standard semantics and maximizes the reached level for this
    * ordering. Emits per-user (user, t1_us, funnel_level, converted,
    * secs_to_convert) with level 0 = no stage-1 event in the data.
    */
  def windowedFunnel(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, stages: Seq[String],
                     windowSec: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val us = unix_micros(col(tsCol))
    val stageCols = stages.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(col(typeCol) === st, us))).as(s"__s$i")
    }
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(stageCols.head, stageCols.tail: _*)
    val w = lit(windowSec * 1000000L)
    // t1 = earliest stage-0 event; t(i) = earliest stage-i event in
    // (t(i-1), t1 + w]. get() on an empty filter result is null (unlike
    // ANSI element_at, which throws) and nulls propagate — a broken
    // chain stays broken.
    val t0 = get(col("__s0"), lit(0))
    val chain = stages.indices.tail.scanLeft(t0) { (prev, i) =>
      get(filter(col(s"__s$i"),
        t => t > prev && t <= t0 + w), lit(0))
    }
    val level = chain.zipWithIndex
      .map { case (t, i) => when(t.isNotNull, i + 1).otherwise(lit(0)) }
      .reduce((a, b) => greatest(a, b))
    val last = chain.last
    perUser.select(col(userCol), t0.as("t1_us"),
      level.cast("int").as("funnel_level"),
      last.isNotNull.as("converted"),
      round((last - t0).cast("double") / 1e6, 6).as("secs_to_convert"))
  }

  /** Last-touch attribution: each conversion event credits the latest
    * touch event (view/click/…) at or before it, within `windowSec`;
    * conversions with no in-window touch attribute to `direct`.
    *
    * Same union-window shape as the as-of join (one user-keyed exchange,
    * one ordered pass — never a conversions × touches join): touches sort
    * before conversions at identical timestamps so an exact-tie touch is
    * visible, and equal-timestamp touches break deterministically toward
    * the lexicographically greatest type (mirrored in the oracle's
    * rank ordering).
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, idCol: String,
                           conversionType: String, touchTypes: Seq[String],
                           windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col(tsCol))
    val idType = events.schema(idCol).dataType
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol), us.as("__us"), lit(1).as("__is_conv"),
        col(idCol), lit(null).cast("string").as("__touch"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), us.as("__us"), lit(0).as("__is_conv"),
        lit(null).cast(idType).as(idCol), col(typeCol).as("__touch"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col("__is_conv"), col("__touch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    conv.unionByName(touch)
      .withColumn("__last", last(
        when(col("__is_conv") === 0, struct(col("__us").as("t"),
          col("__touch").as("ty"))), ignoreNulls = true).over(w))
      .filter(col("__is_conv") === 1)
      .withColumn("__ok", col("__last").isNotNull &&
        col("__us") - col("__last.t") <= lit(windowSec * 1000000L))
      .select(col(idCol),
        coalesce(when(col("__ok"), col("__last.ty")), lit("direct"))
          .as("touch_type"),
        when(col("__ok"),
          round((col("__us") - col("__last.t")).cast("double") / 1e6, 6))
          .as("secs_since_touch"))
  }

  /** Top-k frequent 3-step event paths: consecutive event-type triples
    * per user (two leads over one ordered user exchange) counted and
    * ranked — the sequential-pattern report behind "common user journeys"
    * dashboards, and the natural depth-3 extension of the first-order
    * transition matrix. `TakeOrderedAndProject` top-k; ties break
    * deterministically on the path itself.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, stateCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(tsCol), col(tieCol),
        col(stateCol).as("step1"))
      .withColumn("step2", lead(col("step1"), 1).over(ord))
      .withColumn("step3", lead(col("step1"), 2).over(ord))
      .filter(col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Position-based (U-shaped) multi-touch attribution: every touch in
    * the window before a conversion gets credit — `firstW` to the
    * earliest, `lastW` to the latest, the remainder split evenly across
    * the middle (the standard 40/20/40 scheme). One touch ⇒ full
    * credit; exactly two touches ⇒ no middle exists, so the middle
    * weight splits evenly onto the endpoints (0.5/0.5 under 40/20/40);
    * no touch in window ⇒ a `direct` row with credit 1. Credits thus
    * sum to 1 per conversion for EVERY touch count. Unlike last-touch (which
    * needs only the latest and runs as a union-window pass), the full
    * credit vector needs every in-window touch: a user-keyed join whose
    * fan-out is bounded by per-user touch density × window — the
    * per-user-bounded assumption the window ops already make — then a
    * rank window PER CONVERSION (finer key than user ⇒ no added skew).
    */
  def positionBasedAttribution(events: DataFrame, userCol: String,
                               tsCol: String, typeCol: String, idCol: String,
                               conversionType: String,
                               touchTypes: Seq[String], windowSec: Long,
                               firstW: Double = 0.4,
                               lastW: Double = 0.4): DataFrame = {
    require(firstW > 0 && lastW > 0 && firstW + lastW <= 1.0,
      "need positive end weights with firstW + lastW <= 1")
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col(tsCol))
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol), col(idCol).as("conv_id"), us.as("__cus"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), us.as("__tus"))
    val cand = conv.join(touch,
      conv(userCol) === touch(userCol) &&
        col("__tus") <= col("__cus") &&
        col("__cus") - col("__tus") <= lit(windowSec * 1000000L),
      "left").drop(touch(userCol))
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("__tus"), col("touch_id"))
    val n = count(col("touch_id")).over(Window.partitionBy(col("conv_id")))
    val rn = row_number().over(w)
    val midHalf = (1.0 - firstW - lastW) / 2.0
    val credit = when(col("touch_id").isNull, lit(1.0))
      .when(col("__n") === 1, lit(1.0))
      .when(col("__n") === 2 && col("__rn") === 1, lit(firstW + midHalf))
      .when(col("__n") === 2, lit(lastW + midHalf))
      .when(col("__rn") === 1, lit(firstW))
      .when(col("__rn") === col("__n"), lit(lastW))
      .otherwise((lit(1.0) - lit(firstW) - lit(lastW)) /
        (col("__n") - 2).cast("double"))
    cand
      .withColumn("__n", n)
      .withColumn("__rn", rn)
      .select(col("conv_id"), col("touch_id"),
        coalesce(col("touch_type"), lit("direct")).as("touch_type"),
        when(col("touch_id").isNotNull, col("__rn")).otherwise(lit(0))
          .as("position"),
        col("__n").as("n_touches"),
        round(credit, 6).as("credit"))
  }

  /** Funnel drop-off summary over a [[windowedFunnel]] result: one row
    * per level 0..nStages with the users AT that level, the users who
    * REACHED at least that level (suffix sum), and the step conversion
    * share vs the previous level — the table every funnel dashboard
    * draws. The per-level counts are one hash aggregation of the funnel
    * frame; everything after runs on the (nStages+1)-row spine, bounded
    * by construction, so its partition-less windows are fine (the
    * pareto cum-share precedent). Levels nobody reached still appear,
    * with zero counts.
    */
  def dropoffSummary(funnel: DataFrame, nStages: Int,
                     levelCol: String = "funnel_level"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = funnel.groupBy(col(levelCol).cast("int").as("level"))
      .agg(count(lit(1)).as("__c"))
    val spine = funnel.sparkSession.range(0, nStages + 1)
      .select(col("id").cast("int").as("level"))
    val full = spine.join(counts, Seq("level"), "left")
      .select(col("level"), coalesce(col("__c"), lit(0L)).as("n_at_level"))
    val wDesc = Window.orderBy(col("level").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("level"))
    full.withColumn("n_reached", sum(col("n_at_level")).over(wDesc))
      .withColumn("__prev", lag(col("n_reached"), 1).over(wAsc))
      .select(col("level"), col("n_at_level"), col("n_reached"),
        when(col("__prev").isNotNull && col("__prev") =!= 0,
          round(col("n_reached").cast("double") /
            col("__prev").cast("double"), 6)).as("step_conversion"))
  }

  /** Conversion-latency summary over the windowed funnel: how long do
    * converters take, end to end — count, mean, min/max and the EXACT
    * nearest-rank median of `secs_to_convert` across converted users.
    * The median rides [[graft.ops.Stats.withRangeRank]] (no
    * single-partition sort, no sketch); the target rank (n+1) div 2 is
    * integer arithmetic. An empty converted set yields one row of
    * nulls, not zero rows (the min-over-empty-group trick).
    */
  def timeToConvertSummary(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String,
                           stages: Seq[String], windowSec: Long): DataFrame = {
    val conv = windowedFunnel(events, userCol, tsCol, typeCol, stages,
        windowSec)
      .filter(col("converted"))
      .select(col("secs_to_convert").as("__v"), col(userCol).as("__t"))
    val med = Stats.withRangeRank(conv, Seq(col("__v"), col("__t")), "__r")
      .filter(col("__r") === expr("(__n + 1) div 2"))
      .agg(min(col("__v")).as("p50_secs"))
    conv.agg(count(lit(1)).as("n_converted"),
        round(avg(col("__v")), 6).as("mean_secs"),
        min(col("__v")).as("min_secs"),
        max(col("__v")).as("max_secs"))
      .crossJoin(broadcast(med))
  }

  /** Cohort LTV curve: cumulative revenue per signup-week cohort by
    * week offset — the "how much is a week-N user worth" table behind
    * every retention-economics dashboard. Exact integer cents end to
    * end; the cumulative sum is a cohort-keyed window over the
    * (cohort × offset)-bounded aggregate, and the two emitted money
    * doubles derive from exact integers through a fixed division
    * sequence, shipped UNROUNDED (the stlDecompose lesson: rounding
    * decimal-parked ratios is where engines split).
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, cohortType: String,
                valueCol: String): DataFrame = {
    def week(c: Column): Column = floor(unix_micros(c) / lit(604800000000L))
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(week(col(tsCol))).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val cents = round(col(valueCol) * 100).cast("long")
    val cells = events
      .select(col(userCol), week(col(tsCol)).as("__w"), cents.as("__c"))
      .join(cohorts, Seq(userCol))
      .filter(col("__w") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(sum(col("__c")).as("__rev"),
        countDistinct(col(userCol)).as("n_active_users"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells.join(sizes, Seq("cohort_week"))
      .withColumn("__cum", sum(col("__rev")).over(wc))
      .select(col("cohort_week"), col("week_offset"),
        col("n_active_users"), col("cohort_size"),
        (col("__cum").cast("double") / 100.0).as("cum_revenue"),
        ((col("__cum").cast("double") / col("cohort_size").cast("double"))
          / 100.0).as("ltv_per_user"))
  }

  /** Cohort retention matrix: cohort = epoch-week of the user's first
    * `cohortType` event; a user counts as retained in week-offset k when
    * ANY event of theirs falls k weeks after the cohort week. Two
    * user-keyed aggregations plus a distinct over (cohort, offset, user)
    * — every intermediate is user- or cell-bounded, and the output is
    * weeks × weeks cells.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, cohortType: String): DataFrame = {
    def week(c: Column): Column = floor(unix_micros(c) / lit(604800000000L))
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(week(col(tsCol))).as("cohort_week"))
    events.select(col(userCol), week(col(tsCol)).as("__w"))
      .join(cohorts, Seq(userCol))
      .filter(col("__w") >= col("cohort_week"))
      .select(col(userCol), col("cohort_week"),
        (col("__w") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
