package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CohortFilter, Mets, SafeBand, SeriesOps, Stats}
import graft.sources.Tables

/** GeoMTS-semantics queries (SURVEY.md §2) mapped onto the driver's `events`
  * table as the long-format time series (`user_id`, `ts`, `value`) and
  * `customer` as the subjects table.
  *
  * Timestamps are emitted as epoch-µs BIGINT (`unix_micros` / DuckDB
  * `epoch_us`) so the oracle compare is precision-unambiguous.
  */
object TimeSeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  private val cohortIds = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L)

  def defs: Map[String, Q] = Map(
    // S2: day-granularity date-range scan (both sides cast to Date).
    "s2_date_range_scan" -> { (s, dir) =>
      SeriesOps.dateRange(Tables.events(s, dir), "ts", "2024-01-05", "2024-01-10")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
    },

    // P3/J1: cohort semi-join (broadcast left-semi).
    "p3_semi_join_cohort" -> { (s, dir) =>
      val cohort = Tables.customer(s, dir).filter(col("c_custkey").isin(cohortIds: _*))
        .withColumnRenamed("c_custkey", "user_id")
      CohortFilter.semiJoin(Tables.events(s, dir), cohort, "user_id")
        .select(col("event_id"), col("user_id"), col("value"))
    },

    // P4+P5+P2/P8: composable null-tolerant attribute cohort filter.
    "p8_attribute_cohort" -> { (s, dir) =>
      import CohortFilter._
      CohortFilter(Tables.customer(s, dir), Seq(
        NumericRange("c_acctbal", 0.0, 5000.0),
        CategoricalIn("c_mktsegment", Seq("BUILDING", "AUTOMOBILE")),
        Contains("c_name", "1")
      )).select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    },

    // P11: time-of-day slice crossing midnight (sleep 20:00–04:45).
    "p11_time_of_day_wrap" -> { (s, dir) =>
      SeriesOps.timeOfDayRange(Tables.events(s, dir), "ts", "20:00:00", "04:45:00")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"))
    },

    // A1: global KPIs over a cohort-filtered series.
    "a1_kpis" -> { (s, dir) =>
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
      Stats.kpis(clicks, "value")
        .select(round(col("avg_value"), 4).as("avg_value"),
          col("min_value"), col("max_value"), col("n"))
    },

    // A2: per-group stats with SAMPLE stddev (pandas ddof=1 parity).
    "a2_group_stats" -> { (s, dir) =>
      Stats.groupStats(Tables.events(s, dir), "event_type", "value")
        .select(col("event_type"), col("max_value"), col("min_value"),
          round(col("avg_value"), 4).as("avg_value"),
          round(col("std_value"), 4).as("std_value"), col("n"))
    },

    // A4: per-user observed span.
    "a4_user_span" -> { (s, dir) =>
      SeriesOps.userSpan(Tables.events(s, dir), "user_id", "ts")
        .select(col("user_id"), unix_micros(col("start")).as("start_us"),
          unix_micros(col("end")).as("end_us"), col("n"))
    },

    // A7: tumbling-window downsample (per-user hourly mean).
    "a7_resample_hourly" -> { (s, dir) =>
      SeriesOps.resample(Tables.events(s, dir), "user_id", "ts", "value", "1 hour")
        .select(col("user_id"), unix_micros(col("bucket_start")).as("bucket_us"),
          round(col("avg_value"), 6).as("avg_value"))
    },

    // W5+A8: safe-band (mean ± 2·stddev_samp) anomaly-density buckets.
    "a8_safe_band_density" -> { (s, dir) =>
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
      SafeBand.densityBuckets(clicks, "ts", "value")
    },

    // J2+W1–W4: the full METs pipeline (weight join with 70 kg default,
    // unit conversion, per-user mean calibration, forward-gap nulling).
    "mets_pipeline" -> { (s, dir) =>
      val events = Tables.events(s, dir)
      val weights = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"),
          (lit(40.0) + (col("c_custkey") % 60).cast("double")).as("weight"))
      Mets.calculate(events, weights, "user_id", "ts", "value",
          tiebreak = Some("event_id"))
        .select(col("event_id"), col("user_id"),
          round(col("days_since_start"), 6).as("days_since_start"),
          round(col("mets"), 6).as("mets"))
    },

    // U3/S12: anti-join — subjects with no series data (and, symmetrically,
    // the import-time "insert only new users" upsert, `w4h_db_utils.py:161-166`).
    "u3_anti_join_new_users" -> { (s, dir) =>
      val subjects = Tables.customer(s, dir).select(col("c_custkey").as("user_id"))
      val seriesUsers = Tables.events(s, dir).select(col("user_id"))
      CohortFilter.antiJoin(subjects, seriesUsers, "user_id")
    },

    // U4: dedup keep-first on (user, minute-bucket) with deterministic tiebreak.
    "u4_dedup_keep_first" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("minute_us", unix_micros(date_trunc("minute", col("ts"))))
        .select(col("user_id"), col("minute_us"), col("event_id"), col("value"))
      SeriesOps.dedupKeepFirst(ev, Seq("user_id", "minute_us"), "event_id")
    },

    // J4: exact-timestamp feature alignment (pivot to one row per user+bucket).
    "j4_feature_alignment" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("minute_us", unix_micros(date_trunc("minute", col("ts"))))
      SeriesOps.alignFeatures(ev, "user_id", "minute_us", "event_type", "value",
          features = Seq("click", "view"))
        .withColumnRenamed("click", "f_click")
        .withColumnRenamed("view", "f_view")
    },

    // J7: point-in-interval range join WITHOUT an equi key — error events
    // open 1-hour incident windows; count/sum ALL events falling in each
    // window (cross-user correlation, so no user equi key exists). The
    // bucketed rewrite keeps it an equi join on the time bucket — the
    // plan guard pins out the BroadcastNestedLoopJoin a naive BETWEEN
    // join degrades to.
    "j7_range_join_bucketed" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val pts = ev.select(unix_micros(col("ts")).as("ts_us"), col("value"))
      val iv = ev
        .filter(col("event_type") === "error" && pmod(col("user_id"), lit(17)) === 0)
        .select(col("event_id").as("incident_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + lit(3600L * 1000000L)).as("end_us"))
      SeriesOps.rangeJoinBucketed(pts, iv, "ts_us", "start_us", "end_us",
          bucketUs = 3600L * 1000000L)
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
    },

    // A17: PSI drift monitor between two event populations (view as the
    // reference snapshot, click as live) — fixed-width bins over the
    // reference range, Laplace-smoothed shares, per-bin terms.
    "a17_psi_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      graft.ops.Stats.psi(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"),
        "value", bins = 10)
    },

    // A18: incremental aggregate maintenance — history state + delta
    // state merge per user WITHOUT rescanning history; the merge joins
    // one row per key. The % 3 split stands in for yesterday's state
    // table vs today's ingest.
    "a18_incremental_agg" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val hist = Stats.aggState(
        ev.filter(col("event_id") % 3 === 0), "user_id", "value")
      val delta = Stats.aggState(
        ev.filter(col("event_id") % 3 =!= 0), "user_id", "value")
      Stats.finishAggState(
        Stats.mergeAggStates(hist, delta, "user_id"), "user_id")
    },

    // Z-order curve values: the Morton interleave of quantized
    // (user_id, value) — pure map-side shift/mask arithmetic, the sort
    // key behind multi-dimensional data skipping (OPTIMIZE ZORDER BY).
    "z_curve_values" -> { (s, dir) =>
      import graft.ops.ZOrder._
      Tables.events(s, dir).select(col("event_id"),
        zValue2(quantize16(col("user_id"), 0.0, 150.0),
          quantize16(col("value"), 0.0, 500.0)).as("z"))
    },

    // Data-skipping manifest over explicit curve buckets (top 8 z bits =
    // 256 "files"): per-bucket row counts + min/max of both raw dims —
    // the stats a scan planner consults; small per-bucket boxes on BOTH
    // dimensions are what make either-dimension predicates prunable.
    "z_skipping_manifest" -> { (s, dir) =>
      import graft.ops.ZOrder._
      skippingManifest(Tables.events(s, dir),
        quantize16(col("user_id"), 0.0, 150.0),
        quantize16(col("value"), 0.0, 500.0),
        col("user_id"), col("value"), bits = 8)
    },

    // Windowed funnel (view → click → purchase within 24 h of the first
    // view): ONE user-keyed aggregation collects per-stage timestamp
    // arrays, then pure array expressions resolve the greedy earliest
    // chain — no UDF, no join chain, no second scan.
    "funnel_conversion" -> { (s, dir) =>
      graft.ops.Funnel.windowedFunnel(Tables.events(s, dir), "user_id",
        "ts", "event_type", Seq("view", "click", "purchase"),
        windowSec = 86400L)
    },

    // L234: funnel drop-off summary — per-level at/reached counts and
    // step conversion over the windowed funnel.
    "funnel_dropoff" -> { (s, dir) =>
      val funnel = graft.ops.Funnel.windowedFunnel(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        windowSec = 86400L)
      graft.ops.Funnel.dropoffSummary(funnel, nStages = 3)
    },

    // L281: conversion-latency summary — count/mean/min/max + exact
    // nearest-rank median seconds-to-convert across converted users.
    "funnel_time_to_convert" -> { (s, dir) =>
      graft.ops.Funnel.timeToConvertSummary(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        windowSec = 86400L)
    },

    // L245: cohort LTV curve — cumulative revenue per signup-week
    // cohort by week offset, exact cents, unrounded derived doubles.
    "a28_cohort_ltv" -> { (s, dir) =>
      graft.ops.Funnel.cohortLtv(Tables.events(s, dir), "user_id", "ts",
        "event_type", cohortType = "signup", valueCol = "value")
    },

    // Cohort retention matrix: signup-week cohorts × active-week offsets.
    "cohort_retention_matrix" -> { (s, dir) =>
      graft.ops.Funnel.cohortRetention(Tables.events(s, dir), "user_id",
        "ts", "event_type", cohortType = "signup")
    },

    // Last-touch attribution: each purchase credits the latest view/click
    // within 24 h (one ordered union-window pass — never a conversions ×
    // touches join).
    "attribution_last_touch" -> { (s, dir) =>
      graft.ops.Funnel.lastTouchAttribution(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowSec = 86400L)
    },

    // Right-to-erasure audit: one bounded id set propagated across three
    // differently-keyed tables; each audit row costs one scan (broadcast
    // left join + conditional count) — the purge itself is the same
    // join as a left_anti.
    "gdpr_erasure_audit" -> { (s, dir) =>
      val ids = Tables.events(s, dir)
        .filter(col("user_id") % 10 === 3)
        .select(col("user_id").as("id"))
      graft.ops.Erasure.audit(Seq(
        ("events", Tables.events(s, dir), "user_id"),
        ("customer", Tables.customer(s, dir), "c_custkey"),
        ("orders", Tables.orders(s, dir), "o_custkey")), ids, "id")
    },

    // A16: per-user least-squares trend of value over time (per hour) —
    // "is this subject's metric drifting" (order-stable moment folds).
    "a16_trend_slope" -> { (s, dir) =>
      graft.ops.Stats.trendSlope(Tables.events(s, dir), "user_id", "ts",
        "value", tiebreak = "event_id")
    },

    // A15: rate thinning — keep the earliest reading per (user, hour).
    "a15_thin_per_bucket" -> { (s, dir) =>
      SeriesOps.thinPerBucket(Tables.events(s, dir), "user_id", "ts",
          bucketSec = 3600, tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
    },

    // W11: linear interpolation onto a 30-minute per-user grid.
    "w11_interpolate_grid" -> { (s, dir) =>
      SeriesOps.interpolateGrid(Tables.events(s, dir), "user_id", "ts",
          "value", stepSec = 1800)
        .select(col("user_id"), col("ts_us"),
          round(col("v_interp"), 6).as("v_interp"))
    },

    // W10: per-user forward-fill imputation (sensor gaps). Nulls are
    // planted deterministically (error events) so the fill does real work.
    "w10_forward_fill" -> { (s, dir) =>
      val ev = Tables.events(s, dir).withColumn("v",
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")))
      SeriesOps.forwardFill(ev, "user_id", "ts", "v", tiebreak = "event_id")
        .select(col("event_id"), col("v_filled"))
    },

    // J8: full pairwise correlation matrix in one aggregation pass.
    // Hour-level alignment: minute-level co-occurrence is too sparse for a
    // meaningful matrix on this data (2 of 10 pairs reach n ≥ 2).
    "j8_corr_matrix" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
      val aligned = SeriesOps.alignFeatures(ev, "user_id", "hour_us",
        "event_type", "value",
        features = Seq("click", "error", "purchase", "signup", "view"))
      graft.ops.Stats.pearsonMatrix(aligned,
          Seq("click", "error", "purchase", "signup", "view"))
        .filter(col("n") >= 2) // degenerate pairs: 0/0 NaN semantics differ per engine
        .select(col("feature_a"), col("feature_b"), col("n"),
          round(col("corr"), 6).as("corr"))
    },

    // Skew-salted equi-join: row-for-row equivalent to the plain join —
    // the oracle IS the plain join, so the gate proves salting changes
    // the shuffle layout and nothing else.
    "skew_salted_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        col("value"))
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("weight", lit(60.0) + (col("user_id") % 40).cast("double"))
      graft.ops.Skew.saltedJoin(ev, dim, Seq("user_id"), salts = 8)
        .select(col("event_id"), col("user_id"), col("weight"),
          (col("value") * col("weight")).as("weighted"))
    },

    // Skew diagnosis: top-5 heaviest keys with share and ratio-to-mean —
    // the measurement behind every df-cap/salting decision in the engine.
    "skew_report" -> { (s, dir) =>
      graft.ops.Skew.diagnose(Tables.events(s, dir), "event_type", k = 5)
    },

    // Salted join under REAL skew: 20% of event rows collapse onto one
    // hot user (Zipf-head shape) — without salting that key is one
    // straggler reducer; with salts=8 it spreads across 8. The oracle is
    // the plain join on the same derived key, so the gate proves salting
    // changes only the shuffle layout even when the skew is extreme.
    "skew_stress_salted_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"),
        when(pmod(col("user_id"), lit(5)) === 0, lit(0L))
          .otherwise(col("user_id")).as("user_id"),
        col("value"))
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("weight", lit(60.0) + (col("user_id") % 40).cast("double"))
      graft.ops.Skew.saltedJoin(ev, dim, Seq("user_id"), salts = 8)
        .select(col("event_id"), col("user_id"), col("weight"),
          (col("value") * col("weight")).as("weighted"))
    },

    // J7 (beyond ref): cross-feature Pearson correlation over the aligned
    // frame — explicit moments, identical arithmetic in any engine.
    "j7_feature_corr" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("minute_us", unix_micros(date_trunc("minute", col("ts"))))
      val aligned = SeriesOps.alignFeatures(ev, "user_id", "minute_us",
        "event_type", "value", features = Seq("click", "view"))
      graft.ops.Stats.pearson(aligned, "click", "view")
        .select(col("n"), round(col("corr"), 6).as("corr"))
    },

    // As-of join: each click gets the latest prior view value (≤2 h back).
    "j6_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
      val views = ev.filter(col("event_type") === "view")
      SeriesOps.asofJoinBackward(clicks, views, "user_id", "ts",
          leftValueCols = Seq("event_id", "value"), rightValueCol = "value",
          toleranceSec = Some(7200L))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"), col("asof_value"), col("asof_ts_us"))
    },

    // Sessionization: per-user gap-based sessions (30 min), session stats.
    "w8_sessionize" -> { (s, dir) =>
      SeriesOps.sessionize(Tables.events(s, dir), "user_id", "ts",
          gapSeconds = 1800, tiebreak = "event_id")
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"),
          round(sum(col("value")), 4).as("sum_value"))
    },

    // A10: row count + exact distinct cardinality.
    "a10_counts" -> { (s, dir) =>
      Stats.counts(Tables.events(s, dir), "user_id")
        .select(col("n_rows"), col("n_distinct"))
    },

    // Alert flags: per-user unsafe counts in the trailing window.
    "w6_alert_flags" -> { (s, dir) =>
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
      SafeBand.alertFlags(clicks, "user_id", "ts", "value", windowSeconds = 7 * 86400L)
    },

    // W6/A3: trailing window anchored at latest EVENT time (not wall clock).
    "w6_trailing_window_kpis" -> { (s, dir) =>
      val ev = SeriesOps.trailingWindow(Tables.events(s, dir), "ts", 86400L)
      Stats.kpis(ev, "value")
        .select(round(col("avg_value"), 4).as("avg_value"),
          col("min_value"), col("max_value"), col("n"))
    }
  )

  // DuckDB mirror of ZOrder.spread16/zValue2/quantize16: the same
  // magic-number shift-mask rounds (0x00FF00FF, 0x0F0F0F0F, 0x33333333,
  // 0x55555555) over the same fixed-bounds quantization. The scale
  // factors are written division-first so both engines evaluate the
  // identical IEEE sequence.
  private def zQuantCte(): String =
    """q AS (SELECT event_id,
      |  least(65535, greatest(0,
      |    CAST(floor((user_id - 0.0) * (65536.0 / 150.0)) AS BIGINT))) AS xq,
      |  least(65535, greatest(0,
      |    CAST(floor((value - 0.0) * (65536.0 / 500.0)) AS BIGINT))) AS yq
      |  FROM events),
      |s1 AS (SELECT event_id, ((xq | (xq << 8)) & 16711935) AS x,
      |  ((yq | (yq << 8)) & 16711935) AS y FROM q),
      |s2 AS (SELECT event_id, ((x | (x << 4)) & 252645135) AS x,
      |  ((y | (y << 4)) & 252645135) AS y FROM s1),
      |s3 AS (SELECT event_id, ((x | (x << 2)) & 858993459) AS x,
      |  ((y | (y << 2)) & 858993459) AS y FROM s2),
      |sp AS (SELECT event_id, ((x | (x << 1)) & 1431655765) AS x,
      |  ((y | (y << 1)) & 1431655765) AS y FROM s3)""".stripMargin

  private def zFromSpread(): String = "x | (y << 1)"

  def oracles: Map[String, String] = Map(
    // Latest touch = rank by (ts DESC, type DESC) — the DESC type
    // tie-break mirrors the engine's ordered-window pick at equal
    // timestamps.
    "attribution_last_touch" ->
      """WITH conv AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS cus
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    event_type AS ty
        |  FROM events WHERE event_type IN ('view', 'click')),
        |cand AS (SELECT c.event_id, c.cus, t.tus, t.ty,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY t.tus DESC, t.ty DESC) AS rn
        |  FROM conv c JOIN tch t
        |    ON c.user_id = t.user_id AND t.tus <= c.cus),
        |best AS (SELECT event_id, cus, tus, ty FROM cand WHERE rn = 1)
        |SELECT c.event_id,
        |  CASE WHEN b.event_id IS NOT NULL AND c.cus - b.tus <= 86400000000
        |    THEN b.ty ELSE 'direct' END AS touch_type,
        |  CASE WHEN b.event_id IS NOT NULL AND c.cus - b.tus <= 86400000000
        |    THEN round(CAST(c.cus - b.tus AS DOUBLE) / 1e6, 6)
        |    END AS secs_since_touch
        |FROM conv c LEFT JOIN best b USING (event_id)""".stripMargin,

    "gdpr_erasure_audit" ->
      """WITH ids AS (SELECT DISTINCT user_id AS id FROM events
        |  WHERE user_id % 10 = 3)
        |SELECT 'events' AS table_name, count(*) AS rows_total,
        |  CAST(sum(CASE WHEN user_id IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_purged,
        |  count(*) - CAST(sum(CASE WHEN user_id IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
        |FROM events
        |UNION ALL
        |SELECT 'customer', count(*),
        |  CAST(sum(CASE WHEN c_custkey IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) - CAST(sum(CASE WHEN c_custkey IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer
        |UNION ALL
        |SELECT 'orders', count(*),
        |  CAST(sum(CASE WHEN o_custkey IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  count(*) - CAST(sum(CASE WHEN o_custkey IN (SELECT id FROM ids)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders""".stripMargin,

    // Greedy earliest-chain funnel: list indexing on an empty DuckDB list
    // yields NULL, mirroring the engine's null-propagating get(); the
    // chain CTEs stage the lambda captures (t0 then t1) explicitly.
    "funnel_conversion" ->
      """WITH su AS (SELECT user_id,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'view')) AS s0,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'click')) AS s1,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'purchase')) AS s2
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1),
        |c0 AS (SELECT user_id, s0[1] AS t0, s1, s2 FROM su),
        |c1 AS (SELECT user_id, t0,
        |    list_filter(s1, t -> t > t0 AND t <= t0 + 86400000000)[1] AS t1,
        |    s2 FROM c0),
        |c2 AS (SELECT user_id, t0, t1,
        |    list_filter(s2, t -> t > t1 AND t <= t0 + 86400000000)[1] AS t2
        |  FROM c1)
        |SELECT user_id, t0 AS t1_us,
        |  CAST(CASE WHEN t2 IS NOT NULL THEN 3
        |            WHEN t1 IS NOT NULL THEN 2
        |            WHEN t0 IS NOT NULL THEN 1
        |            ELSE 0 END AS INTEGER) AS funnel_level,
        |  t2 IS NOT NULL AS converted,
        |  round(CAST(t2 - t0 AS DOUBLE) / 1e6, 6) AS secs_to_convert
        |FROM c2""".stripMargin,

    // Same funnel chain CTEs; nearest-rank median over (v, user) order.
    "funnel_time_to_convert" ->
      """WITH su AS (SELECT user_id,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'view')) AS s0,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'click')) AS s1,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'purchase')) AS s2
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1),
        |c0 AS (SELECT user_id, s0[1] AS t0, s1, s2 FROM su),
        |c1 AS (SELECT user_id, t0,
        |    list_filter(s1, t -> t > t0 AND t <= t0 + 86400000000)[1] AS t1,
        |    s2 FROM c0),
        |c2 AS (SELECT user_id, t0, t1,
        |    list_filter(s2, t -> t > t1 AND t <= t0 + 86400000000)[1] AS t2
        |  FROM c1),
        |conv AS (SELECT user_id,
        |    round(CAST(t2 - t0 AS DOUBLE) / 1e6, 6) AS v
        |  FROM c2 WHERE t2 IS NOT NULL),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS rn,
        |    count(*) OVER () AS n FROM conv)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(avg(v), 6) AS mean_secs, min(v) AS min_secs,
        |  max(v) AS max_secs,
        |  (SELECT min(v) FROM r WHERE rn = (n + 1) // 2) AS p50_secs
        |FROM conv""".stripMargin,

    "funnel_dropoff" ->
      """WITH su AS (SELECT user_id,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'view')) AS s0,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'click')) AS s1,
        |    list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'purchase')) AS s2
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1),
        |c0 AS (SELECT user_id, s0[1] AS t0, s1, s2 FROM su),
        |c1 AS (SELECT user_id, t0,
        |    list_filter(s1, t -> t > t0 AND t <= t0 + 86400000000)[1] AS t1,
        |    s2 FROM c0),
        |c2 AS (SELECT user_id, t0, t1,
        |    list_filter(s2, t -> t > t1 AND t <= t0 + 86400000000)[1] AS t2
        |  FROM c1),
        |lv AS (SELECT CASE WHEN t2 IS NOT NULL THEN 3
        |    WHEN t1 IS NOT NULL THEN 2
        |    WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS level FROM c2),
        |cnt AS (SELECT level, count(*) AS c FROM lv GROUP BY 1),
        |sp AS (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS level),
        |fl AS (SELECT sp.level,
        |    CAST(coalesce(cnt.c, 0) AS BIGINT) AS n_at_level
        |  FROM sp LEFT JOIN cnt ON sp.level = cnt.level),
        |re AS (SELECT level, n_at_level,
        |    CAST(sum(n_at_level) OVER (ORDER BY level DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_reached
        |  FROM fl)
        |SELECT level, n_at_level, n_reached,
        |  CASE WHEN lag(n_reached) OVER (ORDER BY level) <> 0
        |    THEN round(CAST(n_reached AS DOUBLE) /
        |      CAST(lag(n_reached) OVER (ORDER BY level) AS DOUBLE), 6)
        |  END AS step_conversion
        |FROM re""".stripMargin,

    "a28_cohort_ltv" ->
      """WITH wk AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |co AS (SELECT user_id, min(w) AS cohort_week FROM wk
        |  WHERE event_type = 'signup' GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM co
        |  GROUP BY 1),
        |cells AS (SELECT co.cohort_week, wk.w - co.cohort_week
        |      AS week_offset,
        |    sum(wk.c) AS rev,
        |    count(DISTINCT wk.user_id) AS n_active_users
        |  FROM wk JOIN co USING (user_id) WHERE wk.w >= co.cohort_week
        |  GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, week_offset, n_active_users,
        |    CAST(sum(rev) OVER (PARTITION BY cohort_week
        |      ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumc
        |  FROM cells)
        |SELECT cum.cohort_week, cum.week_offset,
        |  CAST(cum.n_active_users AS BIGINT) AS n_active_users,
        |  CAST(sz.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(cumc AS DOUBLE) / 100.0 AS cum_revenue,
        |  (CAST(cumc AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)) / 100.0
        |    AS ltv_per_user
        |FROM cum JOIN sz USING (cohort_week)""".stripMargin,

    "cohort_retention_matrix" ->
      """WITH wk AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS w
        |  FROM events),
        |co AS (SELECT user_id, min(w) AS cohort_week FROM wk
        |  WHERE event_type = 'signup' GROUP BY 1),
        |cells AS (SELECT DISTINCT wk.user_id, cohort_week,
        |    w - cohort_week AS week_offset
        |  FROM wk JOIN co USING (user_id) WHERE w >= cohort_week)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM cells GROUP BY 1, 2""".stripMargin,

    "z_curve_values" ->
      s"""WITH ${zQuantCte()}
         |SELECT event_id, ${zFromSpread()} AS z FROM sp""".stripMargin,

    "z_skipping_manifest" ->
      s"""WITH ${zQuantCte()},
         |zb AS (SELECT event_id, (${zFromSpread()}) >> 24 AS bucket FROM sp)
         |SELECT bucket, count(*) AS n_rows,
         |  min(e.user_id) AS x_min, max(e.user_id) AS x_max,
         |  round(min(e.value), 6) AS y_min, round(max(e.value), 6) AS y_max
         |FROM zb JOIN events e USING (event_id)
         |GROUP BY 1""".stripMargin,

    // Mirrors the staged arithmetic exactly: per-side sums round to 6 dp,
    // the merge adds the ROUNDED sums and rounds again, finish divides the
    // merged values — bit-identical across engines by construction.
    "a18_incremental_agg" ->
      """WITH va AS (SELECT user_id, CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_id % 3 = 0 AND value IS NOT NULL),
        |vb AS (SELECT user_id, CAST(value AS DOUBLE) AS v FROM events
        |  WHERE event_id % 3 <> 0 AND value IS NOT NULL),
        |sa AS (SELECT user_id, count(*) AS n, round(sum(v), 6) AS s,
        |    round(sum(v * v), 6) AS ss, min(v) AS mn, max(v) AS mx
        |  FROM va GROUP BY 1),
        |sb AS (SELECT user_id, count(*) AS n, round(sum(v), 6) AS s,
        |    round(sum(v * v), 6) AS ss, min(v) AS mn, max(v) AS mx
        |  FROM vb GROUP BY 1),
        |m AS (SELECT coalesce(sa.user_id, sb.user_id) AS user_id,
        |    coalesce(sa.n, 0) + coalesce(sb.n, 0) AS n,
        |    round(coalesce(sa.s, 0) + coalesce(sb.s, 0), 6) AS s,
        |    round(coalesce(sa.ss, 0) + coalesce(sb.ss, 0), 6) AS ss,
        |    least(coalesce(sa.mn, sb.mn), coalesce(sb.mn, sa.mn)) AS min_v,
        |    greatest(coalesce(sa.mx, sb.mx), coalesce(sb.mx, sa.mx)) AS max_v
        |  FROM sa FULL OUTER JOIN sb ON sa.user_id = sb.user_id)
        |SELECT user_id, n, min_v, max_v, round(s / n, 6) AS mean,
        |  CASE WHEN n > 1
        |    THEN round((ss - s * s / n) / (n - 1), 6) END AS variance
        |FROM m""".stripMargin,

    "a17_psi_drift" ->
      """WITH edges AS (SELECT min(value) AS lo, max(value) AS hi
        |  FROM events WHERE event_type = 'view' AND value IS NOT NULL),
        |rb AS (SELECT CAST(least(9, greatest(0,
        |      CASE WHEN e.hi > e.lo
        |        THEN floor((value - e.lo) / ((e.hi - e.lo) / 10))
        |        ELSE 0 END)) AS INTEGER) AS bin, count(*) AS n
        |  FROM events, edges e
        |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
        |cb AS (SELECT CAST(least(9, greatest(0,
        |      CASE WHEN e.hi > e.lo
        |        THEN floor((value - e.lo) / ((e.hi - e.lo) / 10))
        |        ELSE 0 END)) AS INTEGER) AS bin, count(*) AS n
        |  FROM events, edges e
        |  WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1),
        |grid AS (SELECT CAST(unnest(range(10)) AS INTEGER) AS bin),
        |p AS (SELECT g.bin,
        |    (coalesce(rb.n, 0) + 0.5) /
        |      ((SELECT sum(n) FROM rb) + 0.5 * 10) AS p
        |  FROM grid g LEFT JOIN rb USING (bin)),
        |q AS (SELECT g.bin,
        |    (coalesce(cb.n, 0) + 0.5) /
        |      ((SELECT sum(n) FROM cb) + 0.5 * 10) AS q
        |  FROM grid g LEFT JOIN cb USING (bin))
        |SELECT bin, round(p, 6) AS share_ref, round(q, 6) AS share_cur,
        |  round((p - q) * ln(p / q), 6) AS psi_term
        |FROM p JOIN q USING (bin)""".stripMargin,

    "j7_range_join_bucketed" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |iv AS (SELECT event_id AS incident_id, ts_us AS start_us,
        |    ts_us + 3600000000 AS end_us FROM ev
        |  WHERE event_type = 'error' AND user_id % 17 = 0)
        |SELECT incident_id, count(*) AS n_events,
        |  round(sum(p.value), 2) AS sum_value
        |FROM iv JOIN ev p ON p.ts_us >= iv.start_us AND p.ts_us < iv.end_us
        |GROUP BY 1""".stripMargin,

    "s2_date_range_scan" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type, value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-10'""".stripMargin,

    "p3_semi_join_cohort" ->
      s"""SELECT event_id, user_id, value FROM events
         |WHERE user_id IN (SELECT c_custkey FROM customer
         |                  WHERE c_custkey IN (${cohortIds.mkString(",")}))""".stripMargin,

    "p8_attribute_cohort" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        |WHERE (c_acctbal BETWEEN 0.0 AND 5000.0 OR c_acctbal IS NULL)
        |  AND (c_mktsegment IN ('BUILDING','AUTOMOBILE') OR c_mktsegment IS NULL)
        |  AND c_name LIKE '%1%'""".stripMargin,

    "p11_time_of_day_wrap" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id FROM events
        |WHERE strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') >= '20:00:00'
        |   OR strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') <= '04:45:00'""".stripMargin,

    "a1_kpis" ->
      """SELECT round(avg(value), 4) AS avg_value, min(value) AS min_value,
        |  max(value) AS max_value, count(*) AS n
        |FROM events WHERE event_type = 'click'""".stripMargin,

    "a2_group_stats" ->
      """SELECT event_type, max(value) AS max_value, min(value) AS min_value,
        |  round(avg(value), 4) AS avg_value, round(stddev_samp(value), 4) AS std_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "a4_user_span" ->
      """SELECT user_id, epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
        |  epoch_us(CAST(max(ts) AS TIMESTAMP)) AS end_us, count(*) AS n
        |FROM events GROUP BY user_id""".stripMargin,

    "a7_resample_hourly" ->
      """SELECT user_id, epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "a8_safe_band_density" ->
      """WITH s AS (
        |  SELECT avg(value) AS m, stddev_samp(value) AS sd,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS mn,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS mx
        |  FROM events WHERE event_type = 'click')
        |SELECT CAST(floor((epoch_us(CAST(ts AS TIMESTAMP)) - s.mn)
        |         / greatest((s.mx - s.mn) / 600.0, 30000000.0)) AS BIGINT) AS bucket,
        |  CAST(sum(CASE WHEN value < s.m - 2.0*s.sd OR value > s.m + 2.0*s.sd
        |       THEN 1 ELSE 0 END) AS BIGINT) AS unsafe_rows,
        |  count(*) AS total_rows
        |FROM events, s WHERE event_type = 'click'
        |GROUP BY 1""".stripMargin,

    "mets_pipeline" ->
      """WITH w AS (
        |  SELECT c_custkey AS user_id,
        |         40.0 + CAST(c_custkey % 60 AS DOUBLE) AS weight
        |  FROM customer),
        |j AS (
        |  SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |         e.value * 4.186 / COALESCE(w.weight, 70.0) AS raw
        |  FROM events e LEFT JOIN w ON e.user_id = w.user_id),
        |c AS (
        |  SELECT *, raw / avg(raw) OVER (PARTITION BY user_id) AS cal,
        |         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id)) / 86400000000.0 AS days
        |  FROM j)
        |SELECT event_id, user_id, round(days, 6) AS days_since_start,
        |  round(CASE WHEN lead(days) OVER (PARTITION BY user_id ORDER BY ts, event_id) - days > 0.5
        |        THEN NULL ELSE cal END, 6) AS mets
        |FROM c""".stripMargin,

    "u3_anti_join_new_users" ->
      """SELECT DISTINCT c_custkey AS user_id FROM customer
        |WHERE c_custkey NOT IN (SELECT user_id FROM events)""".stripMargin,

    "u4_dedup_keep_first" ->
      """SELECT user_id,
        |  epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS minute_us,
        |  min(event_id) AS event_id, arg_min(value, event_id) AS value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "j4_feature_alignment" ->
      """SELECT user_id,
        |  epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS minute_us,
        |  min(CASE WHEN event_type = 'click' THEN value END) AS f_click,
        |  min(CASE WHEN event_type = 'view' THEN value END) AS f_view
        |FROM events GROUP BY 1, 2""".stripMargin,

    "a16_trend_slope" ->
      """WITH p AS (SELECT user_id,
        |    list(struct_pack(t := epoch_us(ts), v := value)
        |      ORDER BY ts, event_id) AS l
        |  FROM events GROUP BY 1),
        |d AS (SELECT user_id, len(l) AS n,
        |    list_transform(l, e -> CAST(e.t - l[1].t AS DOUBLE)) AS xs,
        |    list_transform(l, e -> e.v) AS ys
        |  FROM p)
        |SELECT user_id, CAST(n AS BIGINT) AS n_points,
        |  round(3600000000.0 *
        |    (n * list_sum(list_transform(range(len(xs)), i -> xs[i+1] * ys[i+1]))
        |      - list_sum(xs) * list_sum(ys)) /
        |    nullif(n * list_sum(list_transform(xs, x -> x * x))
        |      - list_sum(xs) * list_sum(xs), 0), 6) + 0 AS slope_per_hour
        |FROM d""".stripMargin,

    "a15_thin_per_bucket" ->
      """SELECT event_id, user_id, ts_us, value FROM (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    value, row_number() OVER (
        |      PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    "w11_interpolate_grid" ->
      """WITH b AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CAST(value AS DOUBLE) AS v FROM events),
        |span AS (SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
        |  FROM b GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(
        |    ((mn + 1800000000 - 1) // 1800000000) * 1800000000,
        |    (mx // 1800000000) * 1800000000 + 1, 1800000000)) AS ts_us
        |  FROM span),
        |u AS (SELECT user_id, ts_us, v, 0 AS g FROM b
        |  UNION ALL SELECT user_id, ts_us, NULL, 1 FROM grid),
        |w AS (SELECT user_id, ts_us, g,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pts,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
        |  last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us DESC, g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nts
        |  FROM u)
        |SELECT user_id, ts_us,
        |  round(CASE WHEN nts = pts THEN pv
        |    ELSE pv + (nv - pv) * CAST(ts_us - pts AS DOUBLE) / (nts - pts)
        |  END, 6) AS v_interp
        |FROM w WHERE g = 1""".stripMargin,

    "w10_forward_fill" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, last_value(v IGNORE NULLS) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM ev""".stripMargin,

    "j8_corr_matrix" -> {
      val feats = Seq("click", "error", "purchase", "signup", "view")
      val pairSelects = (for {
        i <- feats.indices; j <- (i + 1) until feats.size
      } yield {
        val (a, b) = (feats(i), feats(j))
        s"""SELECT '$a' AS feature_a, '$b' AS feature_b, count(*) AS n,
           |  round((count(*)*sum(fx*fy) - sum(fx)*sum(fy)) /
           |    nullif(sqrt(count(*)*sum(fx*fx) - sum(fx)*sum(fx)) *
           |           sqrt(count(*)*sum(fy*fy) - sum(fy)*sum(fy)), 0), 6) AS corr
           |FROM (SELECT CAST(f_$a AS DOUBLE) AS fx, CAST(f_$b AS DOUBLE) AS fy
           |      FROM al WHERE f_$a IS NOT NULL AND f_$b IS NOT NULL)""".stripMargin
      }).mkString("\nUNION ALL\n")
      val pivots = feats.map(f =>
        s"min(CASE WHEN event_type = '$f' THEN value END) AS f_$f").mkString(",\n  ")
      s"""WITH al AS (SELECT user_id,
         |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS m,
         |  $pivots
         |  FROM events GROUP BY 1, 2)
         |SELECT * FROM ($pairSelects) WHERE n >= 2""".stripMargin
    },

    "skew_salted_join" ->
      """WITH dim AS (SELECT DISTINCT user_id,
        |    60.0 + CAST(user_id % 40 AS DOUBLE) AS weight FROM events)
        |SELECT e.event_id, e.user_id, d.weight, e.value * d.weight AS weighted
        |FROM events e JOIN dim d USING (user_id)""".stripMargin,

    "skew_stress_salted_join" ->
      """WITH ev AS (SELECT event_id,
        |    CASE WHEN user_id % 5 = 0 THEN 0 ELSE user_id END AS user_id,
        |    value FROM events),
        |dim AS (SELECT DISTINCT user_id,
        |    60.0 + CAST(user_id % 40 AS DOUBLE) AS weight FROM ev)
        |SELECT e.event_id, e.user_id, d.weight, e.value * d.weight AS weighted
        |FROM ev e JOIN dim d USING (user_id)""".stripMargin,

    "skew_report" ->
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
        |  CAST(count(*) AS DOUBLE) AS nk FROM c)
        |SELECT event_type, cnt, round(cnt / total, 6) AS share,
        |  round(cnt * nk / total, 6) AS ratio_to_mean
        |FROM c, t ORDER BY cnt DESC, event_type LIMIT 5""".stripMargin,

    "j7_feature_corr" ->
      """WITH al AS (SELECT user_id,
        |    date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
        |    min(CASE WHEN event_type = 'click' THEN value END) AS fx,
        |    min(CASE WHEN event_type = 'view' THEN value END) AS fy
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT CAST(fx AS DOUBLE) AS fx, CAST(fy AS DOUBLE) AS fy
        |  FROM al WHERE fx IS NOT NULL AND fy IS NOT NULL),
        |mo AS (SELECT count(*) AS n, sum(fx) AS sx, sum(fy) AS sy,
        |  sum(fx*fy) AS sxy, sum(fx*fx) AS sxx, sum(fy*fy) AS syy FROM p)
        |SELECT n, round((n*sxy - sx*sy) /
        |  (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6) AS corr
        |FROM mo""".stripMargin,

    "a10_counts" ->
      """SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_distinct
        |FROM events""".stripMargin,

    "j6_asof_join" ->
      """WITH l AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'view')
        |SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id, l.value,
        |  CASE WHEN r.ts IS NOT NULL AND epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000
        |    THEN r.value END AS asof_value,
        |  CASE WHEN r.ts IS NOT NULL AND epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000
        |    THEN epoch_us(r.ts) END AS asof_ts_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "w8_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |  lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s AS (SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
        |    OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
        |  round(sum(value), 4) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    "w6_alert_flags" ->
      """WITH s AS (SELECT avg(value) AS m, stddev_samp(value) AS sd FROM events
        |  WHERE event_type = 'click'),
        |mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mt FROM events
        |  WHERE event_type = 'click'),
        |recent AS (SELECT user_id, value FROM events, mx
        |  WHERE event_type = 'click'
        |    AND CAST(ts AS TIMESTAMP) >= mt - INTERVAL 604800 SECOND)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN value < s.m - 2.0*s.sd OR value > s.m + 2.0*s.sd
        |    THEN 1 ELSE 0 END) AS BIGINT) AS unsafe_in_window,
        |  count(*) AS rows_in_window,
        |  sum(CASE WHEN value < s.m - 2.0*s.sd OR value > s.m + 2.0*s.sd
        |    THEN 1 ELSE 0 END) > 0 AS alert
        |FROM recent, s GROUP BY user_id""".stripMargin,

    "w6_trailing_window_kpis" ->
      """WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events)
        |SELECT round(avg(value), 4) AS avg_value, min(value) AS min_value,
        |  max(value) AS max_value, count(*) AS n
        |FROM events, mx
        |WHERE CAST(ts AS TIMESTAMP) >= m - INTERVAL 86400 SECOND""".stripMargin
  )
}
