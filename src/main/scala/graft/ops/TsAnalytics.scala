package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics beyond the reference's KPI set: time-weighted
  * means over irregular samples, rolling autocorrelation, CUSUM
  * change-point location, seasonal-naive forecast evaluation, and a
  * sampling-completeness report — the monitoring layer a production
  * wearable/metrics pipeline runs on top of the §2.5 window ops.
  *
  * Scale design: every operator here is one window pass and/or one or
  * two key-bounded aggregations over the `(user, ts)` exchange the
  * series layer already pays; outputs are per-user (or per-bucket) rows,
  * never event-sized blowups, and nothing collects to the driver. All
  * running/cumulative sums are frame-ordered (deterministic IEEE
  * accumulation order, mirrored exactly by the DuckDB oracles).
  */
object TsAnalytics {

  /** Interval-weighted (time-weighted) average per user: each sample is
    * weighted by its holding time until the next sample — the standard
    * TWAP/conditioning for irregularly-sampled gauges, where a plain
    * mean over-weights bursts. The per-user last sample carries no
    * interval and drops out of the weighting (standard left-Riemann
    * convention). One window (lead) + one user-keyed agg.
    */
  def timeWeightedAvg(df: DataFrame, userCol: String, tsCol: String,
                      valueCol: String, tieCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val ord = Window.partitionBy(col(userCol)).orderBy(us, col(tieCol))
    val dt = (lead(us, 1).over(ord) - us).cast("double") / 1e6
    df.select(col(userCol), col(tieCol), col(valueCol), dt.as("__dt"))
      .filter(col("__dt").isNotNull)
      .groupBy(col(userCol))
      .agg(
        round(sum(col(valueCol) * col("__dt")) / sum(col("__dt")), 4)
          .as("time_weighted_avg"),
        round(sum(col("__dt")), 6).as("span_secs"),
        count(lit(1)).as("n_intervals"))
  }

  /** Rolling lag-1 autocorrelation per user over a trailing `frameRows`
    * row frame: Pearson corr of (value, previous value) from frame-local
    * sums — the standard persistence/trend-stability diagnostic. Rows
    * without a full frame emit null (warm-up). One exchange; the lag and
    * all six frame sums share a single (user × ts) sort.
    */
  def rollingAutocorr(df: DataFrame, userCol: String, tsCol: String,
                      valueCol: String, tieCol: String,
                      frameRows: Int): DataFrame = {
    require(frameRows >= 3, "need at least 3 rows for a correlation frame")
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val frame = ord.rowsBetween(-(frameRows - 1), 0)
    val x = col("__x"); val y = col("__y")
    val n = count(y).over(frame).cast("double")
    val sx = sum(when(y.isNotNull, x)).over(frame)
    val sy = sum(y).over(frame)
    val sxx = sum(when(y.isNotNull, x * x)).over(frame)
    val syy = sum(y * y).over(frame)
    val sxy = sum(x * y).over(frame)
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    df.select(col(userCol), col(tsCol), col(tieCol),
        col(valueCol).as("__x"))
      .withColumn("__y", lag(col("__x"), 1).over(ord))
      .withColumn("__nf", n)
      .withColumn("autocorr",
        when(col("__nf") === frameRows && varx > 0 && vary > 0,
          round(cov / sqrt(varx * vary), 4)))
      .filter(col("__nf") === frameRows)
      .select(col(userCol), unix_micros(col(tsCol)).as("ts_us"),
        col(tieCol), col("autocorr"))
  }

  /** Autocorrelation function per user: full-series Pearson(xₜ, xₜ₋ₖ)
    * for every lag k = 1..maxLag — the seasonality/persistence
    * fingerprint (an ACF spike at k=24 on hourly data means daily
    * seasonality, feeding the season choice in [[seasonalNaiveEval]]).
    * One ordered window computes all K lags on a single sort; the lag
    * columns explode to (k, x, y) pairs and reduce in one (user × k)
    * aggregation — K output rows per user, never K passes.
    */
  def acf(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
          tieCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 48, "maxLag in 1..48")
    val ord = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val x = col(valueCol).cast("double")
    val lagged = df.select(
      col(userCol) +: x.as("__x") +:
        (1 to maxLag).map(k => lag(x, k).over(ord).as(s"__l$k")): _*)
    val pairs = lagged.select(col(userCol), col("__x"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("k"), col(s"__l$k").as("y"))): _*)).as("__p"))
      .select(col(userCol), col("__x").as("x"),
        col("__p.k").as("lag"), col("__p.y").as("y"))
      .filter(col("y").isNotNull)
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")); val sy = sum(col("y"))
    val sxy = sum(col("x") * col("y"))
    val sxx = sum(col("x") * col("x")); val syy = sum(col("y") * col("y"))
    // Zero variance on either side (constant series, or a single pair)
    // has no defined correlation: emit null, never divide — ANSI mode
    // turns the 0 divisor into a query-killing error (z-test lesson).
    val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    pairs.groupBy(col(userCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        round(when(den > 0, (n * sxy - sx * sy) / den), 4).as("acf"))
  }

  /** CUSUM change-point location per user: cumulative sum of deviations
    * from the user's own mean, change point at the maximum |S_i| (Page's
    * cumulative-sum statistic; the argmax of the excursion is the
    * classic single-change-point estimate). Earliest row wins an exact
    * tie. Two windows (partition mean, running sum) and one ranking pass
    * over one (user × order) exchange; output is one row per user.
    */
  def cusumChangepoint(df: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, tieCol: String): DataFrame = {
    val part = Window.partitionBy(col(userCol))
    val ord = part.orderBy(col(tsCol), col(tieCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = col(valueCol) - avg(col(valueCol)).over(part)
    val s = sum(dev).over(run)
    val pick = Window.partitionBy(col(userCol))
      .orderBy(abs(col("__s")).desc, col(tsCol), col(tieCol))
    df.select(col(userCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("__s", s)
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(userCol), col("__n").as("n"),
        unix_micros(col(tsCol)).as("changepoint_us"),
        round(abs(col("__s")), 4).as("max_abs_cusum"))
  }

  /** Seasonal-naive forecast evaluation per user: resample to per-user
    * hourly means, forecast each bucket with the bucket `seasonHours`
    * earlier (y-hat_t = y_{t-s}, the standard seasonal-naive baseline
    * every forecast eval is scored against), and report MAE over the
    * buckets where the seasonal predecessor exists. The forecast join is
    * a self equi-join on (user, bucket − s) — no window over sparse
    * buckets, so missing hours never misalign the season.
    */
  def seasonalNaiveEval(df: DataFrame, userCol: String, tsCol: String,
                        valueCol: String, tieCol: String,
                        seasonHours: Int): DataFrame = {
    require(seasonHours > 0, "seasonHours must be positive")
    // Cross-engine determinism: the MAE is carried END-TO-END in exact
    // integer micro-units. Each |y − ŷ| is quantized once
    // (round(d·1e6), absorbing the ≤ulp wobble of the hourly float
    // means), summed exactly (integer addition is order-free, so
    // partial-agg merge order cannot matter), and the final per-bucket
    // mean is rounded to an integer micro-unit. A fractional-dp rounded
    // DOUBLE here is NOT reproducible across engines: 2-dp inputs with
    // small bucket counts park the true MAE exactly on 4-dp half
    // boundaries (observed at sf0.01: mae = 38.69875 precisely), where
    // Spark's shortest-decimal-repr rounding and a scaled-float
    // rounding (DuckDB) legitimately disagree. Integer outputs have no
    // such boundary: round(S/n) only ties at exact .5, which both
    // engines round up.
    val bucket = floor(unix_micros(col(tsCol)) / lit(3600000000L))
    val hourly = df.groupBy(col(userCol), bucket.as("bucket"))
      .agg(avg(col(valueCol)).as("y"))
    val fc = hourly.select(col(userCol),
      (col("bucket") + seasonHours).as("bucket"), col("y").as("yhat"))
    val dMicro = round(abs(col("y") - col("yhat")) * 1e6).cast("long")
    hourly.join(fc, Seq(userCol, "bucket"), "inner")
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_eval"), sum(dMicro).as("__s"))
      .select(col(userCol), col("n_eval"),
        round(col("__s").cast("double") / col("n_eval").cast("double"))
          .cast("long").as("mae_micro"))
  }

  /** Final exponentially-weighted moving average per user:
    * y_t = α·x_t + (1−α)·y_{t−1}, seeded with the first sample — the
    * standard smoothing/forecast level every monitoring stack keeps.
    * A recurrence is not window-expressible, so the per-user series is
    * collected SORTED and folded with `aggregate` — per-user-bounded
    * arrays, the same assumption every window op here makes, and the
    * forced fold order makes the result bit-identical in any engine
    * that folds left (DuckDB `list_reduce` mirrors it exactly,
    * including the seed-with-first convention). The (1−α) complement is
    * computed at runtime from α in BOTH engines — precomputing 0.7 in
    * one and evaluating 1−0.3 in the other differs by one ulp.
    */
  def ewma(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
           tieCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val pts = array_sort(collect_list(struct(
      unix_micros(col(tsCol)).as("t"), col(tieCol).as("k"),
      col(valueCol).cast("double").as("v"))))
    df.groupBy(col(userCol)).agg(pts.as("__p"))
      .select(col(userCol), size(col("__p")).cast("long").as("n"),
        round(aggregate(
          slice(col("__p"), lit(2), greatest(size(col("__p")) - 1, lit(0))),
          element_at(col("__p"), 1).getField("v"),
          (acc, e) => lit(alpha) * e.getField("v") +
            (lit(1.0) - lit(alpha)) * acc), 4).as("ewma"))
  }

  /** Sampling-completeness report per user: expected hourly buckets from
    * the user's own observed span (absolute hour grid, so no per-user
    * anchor join), present = distinct hours actually seen, missing =
    * expected − present. Pure two-level aggregation — no grid explode,
    * no calendar table: the span bound makes `expected` arithmetic.
    */
  def completenessReport(df: DataFrame, userCol: String,
                         tsCol: String): DataFrame = {
    val bucket = floor(unix_micros(col(tsCol)) / lit(3600000000L))
    df.groupBy(col(userCol), bucket.as("__b"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(userCol))
      .agg((max(col("__b")) - min(col("__b")) + 1).as("expected_hours"),
        count(lit(1)).as("present_hours"),
        sum(col("__n")).as("n_events"))
      .select(col(userCol), col("expected_hours"), col("present_hours"),
        (col("expected_hours") - col("present_hours")).as("missing_hours"),
        round(col("present_hours").cast("double") /
          col("expected_hours").cast("double"), 6).as("coverage"))
  }

  /** STL-lite seasonal decomposition per user: value = trend + seasonal
    * + residual over the user's HOURLY TOTALS. Trend is the centered
    * 25-row moving average over observed hourly buckets (index-based,
    * so gaps compress rather than widen the window — the deliberate
    * simplification vs calendar-grid STL), quantized to integer cents;
    * seasonal is the mean detrended total per hour-of-day; residual the
    * remainder.
    *
    * Determinism by construction, the integer-cent discipline: hourly
    * totals are exact cent sums; the trend frame sum/count are exact
    * integers (sliding-window retraction vs segment-tree evaluation
    * both stay exact on Longs, unlike float frames); every emitted
    * double derives from exact integers through the IDENTICAL spelled
    * division sequence, so outputs ship UNROUNDED — rounding is where
    * decimal-parked averages (x.xxxx5 rationals) make engines disagree
    * at half-points, the failure the first cut of this op hit. One
    * bucket aggregation + one user-keyed ordered window + one
    * (user, hour-of-day)-keyed window — three even exchanges.
    */
  def stlDecompose(df: DataFrame, userCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val hb = floor(unix_micros(col(tsCol)) / lit(3600000000L))
    val cents = round(col(valueCol) * 100).cast("long")
    val hourly = df.groupBy(col(userCol), hb.as("hour_bucket"))
      .agg(sum(cents).as("__vc"))
    val wT = Window.partitionBy(col(userCol)).orderBy(col("hour_bucket"))
      .rowsBetween(-12, 12)
    val wS = Window.partitionBy(col(userCol),
      pmod(col("hour_bucket"), lit(24L)))
    hourly
      .withColumn("__tc",
        floor(sum(col("__vc")).over(wT).cast("double") /
          count(lit(1)).over(wT)).cast("long"))
      .withColumn("__sc",
        sum(col("__vc") - col("__tc")).over(wS).cast("double") /
          count(lit(1)).over(wS))
      .select(col(userCol),
        col("hour_bucket").cast("long").as("hour_bucket"),
        (col("__vc").cast("double") / 100.0).as("value"),
        (col("__tc").cast("double") / 100.0).as("trend"),
        (col("__sc") / 100.0).as("seasonal"),
        (((col("__vc") - col("__tc")).cast("double") - col("__sc")) / 100.0)
          .as("residual"))
  }

  /** Seasonally-adjusted anomaly flags: hours whose [[stlDecompose]]
    * residual exceeds `nSigma` robust sigmas of the user's OWN residual
    * distribution (MAD × 1.4826) — the drift screen that a raw z-score
    * or an unadjusted MAD misfires on whenever the series has daily
    * shape (the anomaly IS "far from this hour's norm", not "far from
    * the mean"). Residuals are the exact-integer-derived doubles the
    * decomposition emits, the per-user MAD is the LOWER MEDIAN of a
    * sorted bounded array (element_at — no interpolation, so both
    * engines pick the identical element), and the comparison runs on
    * raw doubles with no rounding anywhere — deterministic end to end.
    */
  def stlAnomalies(df: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, nSigma: Double = 3.0): DataFrame = {
    // Scope-cached: the decomposition feeds both the MAD aggregate and
    // the flag join — uncached it would derive twice.
    val dec = OpCaches.scoped(stlDecompose(df, userCol, tsCol, valueCol))
    val mad = dec.groupBy(col(userCol))
      .agg(sort_array(collect_list(abs(col("residual")))).as("__a"))
      .select(col(userCol),
        element_at(col("__a"),
          expr("CAST((size(__a) + 1) div 2 AS INT)")).as("__mad"))
    // The threshold factor is ONE precomputed double (n·1.4826): the
    // oracle interpolates the same value's decimal text, so the
    // unrounded strict comparison sits on identical doubles both sides.
    val thr = nSigma * 1.4826
    dec.join(mad, Seq(userCol))
      .filter(col("__mad") > 0.0 &&
        abs(col("residual")) > lit(thr) * col("__mad"))
      .select(col(userCol), col("hour_bucket"), col("value"),
        col("residual"))
  }

  /** Rolling active-user counts: per day, DAU and the EXACT trailing
    * 7-day WAU. Distinct-over-sliding-window does not decompose into
    * partial aggregates — the classic fix is the COVERAGE EXPLODE:
    * each (user, active-day) pair covers days d..d+6, turning the
    * window distinct into a per-day `countDistinct` (two-phase
    * partial-distinct aggregation, fully parallel). Fan-out is a flat
    * 7× of the (user, day) DEDUPED frame — days per user, not events —
    * which is the scalable trade against a per-day set union. Output
    * covers days with activity (trailing windows of silent days join
    * away).
    */
  def activeUsers(df: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val day = floor(unix_micros(col(tsCol)) / lit(86400000000L))
    val ud = df.select(col(userCol).as("__u"), day.as("__d")).distinct()
    val dau = ud.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("__u"),
        explode(sequence(col("__d"), col("__d") + 6)).as("day"))
      .groupBy(col("day")).agg(countDistinct(col("__u")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day").cast("long").as("day"), col("dau"), col("wau"))
  }

  /** Union length of possibly-overlapping per-user intervals — "total
    * covered time" when sessions/treatments overlap, where a plain
    * SUM(end−start) double-counts. Classic gaps-and-islands: an
    * interval opens a new island iff its start exceeds the running max
    * end of every earlier interval; islands then collapse to merged
    * spans. Three window expressions (running max, island flag,
    * island id) plus the island aggregate all ride ONE user-keyed
    * exchange; arithmetic is pure integers, so the oracle agrees
    * exactly.
    */
  def intervalUnion(df: DataFrame, userCol: String, startCol: String,
                    endCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(startCol), col(endCol))
    val runMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(userCol), col(startCol), col(endCol))
      .withColumn("__rm", runMax)
      .withColumn("__new",
        when(col("__rm").isNull || col(startCol) > col("__rm"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__isl"))
      .agg(min(col(startCol)).as("__ss"), max(col(endCol)).as("__se"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__se") - col("__ss")).as("covered_us"))
  }

  /** Holt double (linear-trend) exponential smoothing per user: level
    * lₜ = α·yₜ + (1−α)(lₜ₋₁+bₜ₋₁), trend bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
    * initialized the textbook way (l₁ = y₁, b₁ = y₂−y₁; Holt 1957).
    * Emits the final level/trend and the one-step-ahead forecast
    * l + b — the [[ewma]] fold with a 2-component struct accumulator,
    * so the same per-user-bounded collect_list contract applies (a
    * user's own series fits an executor; the DISTRIBUTION is across
    * users). Users with fewer than two samples have no trend estimate
    * and are omitted. The (1.0 − α) subtractions are spelled
    * identically in the oracle's recursion so both engines run the
    * same IEEE ops in the same order.
    */
  def holtSmoothing(df: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, tieCol: String,
                    alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta > 0.0 && beta <= 1.0, "beta must be in (0, 1]")
    val pts = array_sort(collect_list(struct(
      unix_micros(col(tsCol)).as("t"), col(tieCol).as("k"),
      col(valueCol).cast("double").as("v"))))
    val v1 = element_at(col("__p"), 1).getField("v")
    val v2 = element_at(col("__p"), 2).getField("v")
    df.groupBy(col(userCol)).agg(pts.as("__p"))
      .filter(size(col("__p")) >= 2)
      .withColumn("__f", aggregate(
        slice(col("__p"), lit(2), greatest(size(col("__p")) - 1, lit(0))),
        struct(v1.as("l"), (v2 - v1).as("b")),
        (acc, e) => {
          val lNew = lit(alpha) * e.getField("v") +
            (lit(1.0) - lit(alpha)) * (acc.getField("l") + acc.getField("b"))
          struct(lNew.as("l"),
            (lit(beta) * (lNew - acc.getField("l")) +
              (lit(1.0) - lit(beta)) * acc.getField("b")).as("b"))
        }))
      .select(col(userCol), size(col("__p")).cast("long").as("n"),
        round(col("__f").getField("l"), 4).as("level"),
        round(col("__f").getField("b"), 4).as("trend"),
        round(col("__f").getField("l") + col("__f").getField("b"), 4)
          .as("forecast_next"))
  }

  /** Lead–lag cross-correlation between two bucketed series (does metric
    * A anticipate metric B, and by how many buckets): Pearson corr of
    * (a(t), b(t + lag)) for each lag in [−maxLag, +maxLag], over hours
    * where BOTH sides exist. Positive lag = a leads b.
    *
    * Each side reduces to its per-bucket mean first (two bucket-keyed
    * hash-aggs, shuffle = |buckets| rows), so the lag join runs on the
    * TINY bucketed frames, never on events: the 2·maxLag+1 lag spine is
    * a broadcast literal and the shifted equi-join is bucket-keyed.
    * Pairwise-complete correlation from frame-local moments, 4 dp.
    *
    * The shifted key is `trunc(ts) + lag·bucket_micros`, which assumes
    * truncated-bucket starts are uniformly spaced — true for 'hour'
    * always, but for 'day' only in a fixed-offset zone (DST days are
    * 23/25 h). The 'day' bucket therefore requires a UTC session
    * timezone and asserts it.
    */
  def crossCorrelation(df: DataFrame, tsCol: String, valueCol: String,
                       seriesCol: String, seriesA: String, seriesB: String,
                       bucket: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 48, "maxLag in 1..48")
    val spark = df.sparkSession
    if (bucket == "day") {
      val tz = spark.conf.get("spark.sql.session.timeZone", "")
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
        s"bucket='day' needs a fixed-offset UTC session timezone " +
          s"(got '$tz'): DST days are not 86400s apart, so the fixed " +
          s"micros shift would miss buckets")
    }
    import spark.implicits._
    def side(name: String, out: String) = df
      .filter(col(seriesCol) === name && col(valueCol).isNotNull)
      .groupBy(unix_micros(date_trunc(bucket, col(tsCol))).as("__t"))
      .agg(avg(col(valueCol)).as(out))
    val bucketUs: Long = bucket match {
      case "hour" => 3600000000L
      case "day"  => 86400000000L
      case other  => throw new IllegalArgumentException(
        s"unsupported bucket '$other' (hour|day)")
    }
    val lags = (-maxLag to maxLag).toDF("lag")
    val a = side(seriesA, "__va").crossJoin(broadcast(lags))
      .withColumn("__tb", col("__t") + col("lag") * bucketUs)
    val joined = a.join(side(seriesB, "__vb")
        .withColumnRenamed("__t", "__tb"), "__tb")
    joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__va")).as("__sa"), sum(col("__vb")).as("__sb"),
        sum(col("__va") * col("__va")).as("__saa"),
        sum(col("__vb") * col("__vb")).as("__sbb"),
        sum(col("__va") * col("__vb")).as("__sab"))
      .select(col("lag"), col("n_buckets"),
        when(col("n_buckets") >= 3,
          round((col("n_buckets") * col("__sab") - col("__sa") * col("__sb")) /
            nullif(sqrt(col("n_buckets") * col("__saa") -
                col("__sa") * col("__sa")) *
              sqrt(col("n_buckets") * col("__sbb") -
                col("__sb") * col("__sb")), lit(0.0)), 4))
          .as("xcorr"))
  }

  /** Burstiness per entity: the Goh–Barabási coefficient
    * B = (σ − μ)/(σ + μ) of the inter-arrival gaps (−1 = perfectly
    * periodic, 0 = Poisson, →1 = extremely bursty), plus the CV — the
    * traffic-shape fingerprint that separates schedulers from humans
    * from retry storms. One (user × ts) window for the lag, one
    * user-keyed agg of the gap moments; entities need ≥ 3 events
    * (≥ 2 gaps) for a sample σ. Gaps in integer micros until the final
    * moment divisions; 4 dp.
    */
  def burstiness(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val ord = Window.partitionBy(col(userCol)).orderBy(us, col(tieCol))
    val gap = (us - lag(us, 1).over(ord)).cast("double") / 1e6
    df.select(col(userCol), gap.as("__g"))
      .filter(col("__g").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("__g")).as("__mu"),
        stddev_samp(col("__g")).as("__sd"))
      .filter(col("n_gaps") >= 2)
      .select(col(userCol), col("n_gaps"),
        round(col("__mu"), 4).as("mean_gap_secs"),
        when(col("__sd") + col("__mu") > 0.0,
          round((col("__sd") - col("__mu")) / (col("__sd") + col("__mu")), 4))
          .as("burstiness"),
        when(col("__mu") > 0.0, round(col("__sd") / col("__mu"), 4))
          .as("cv"))
  }
}
