package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Melt
import graft.sources.Tables

/** Scalar-function, melt, top-k, and widget-seeding queries (SURVEY.md
  * §2.1 S1/S10, §2.4 A5–A6, §2.5 W2, §2.6 O-series, §2.8 F-series).
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    // S1: full projection scan (ts normalized to epoch-µs).
    "s1_full_scan" -> { (s, dir) =>
      Tables.events(s, dir).select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    },

    // S10: wide→long melt of measure columns via the stack generator.
    "s10_melt_wide_to_long" -> { (s, dir) =>
      Melt(Tables.lineitem(s, dir).filter(col("l_orderkey") < 100),
        idCols = Seq("l_orderkey", "l_linenumber"),
        valueCols = Seq("l_quantity", "l_extendedprice", "l_discount"))
    },

    // A5: column bounds for widget seeding.
    "a5_column_bounds" -> { (s, dir) =>
      Tables.orders(s, dir).agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        // o_orderdate arrives as TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
        // cast is identity under the UTC session zone.
        unix_micros(min(col("o_orderdate")).cast("timestamp")).as("min_date_us"),
        unix_micros(max(col("o_orderdate")).cast("timestamp")).as("max_date_us"))
    },

    // A6: distinct attribute values.
    "a6_distinct_values" -> { (s, dir) =>
      Tables.customer(s, dir).select(col("c_mktsegment")).distinct()
    },

    // W12: per-user z-score normalization (feature standardization before
    // cross-user comparison; nullif guards single-reading users).
    "w12_zscore_per_user" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir).select(col("event_id"),
        round((col("value") - avg(col("value")).over(w)) /
          nullif(stddev_samp(col("value")).over(w), lit(0.0)), 6).as("zscore"))
    },

    // W2: standalone per-user mean calibration.
    "w2_mean_calibration" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .select(col("event_id"),
          round(col("value") / avg(col("value")).over(w), 6).as("calibrated"))
    },

    // W9 (beyond ref): per-user rolling mean over the last 5 readings —
    // the smoothing the dashboard applies client-side, as a window frame.
    "w9_rolling_avg" -> { (s, dir) =>
      // event_id tie-break: (user_id, ts) is unique in the testdata, but a
      // ROWS frame ordered by ts alone would be engine-dependent on real
      // data with equal timestamps — same convention as a15/forwardFill.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, dir).select(col("event_id"),
        round(avg(col("value")).over(w), 6).as("rolling_avg"))
    },

    // O3: deterministic top-k per group (rank + tie-break).
    "o3_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir).filter(col("o_custkey") <= 100)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },

    // O3 at scale: the same top-3-per-customer report via the TopKAgg
    // typed aggregate — bounded k-slot buffers reduce map-side and the
    // shuffle carries k pairs per GROUP instead of every fact row; no
    // window sort anywhere. Runs over ALL customers (the window variant
    // gates a 100-customer slice) because the aggregate's cost is
    // groups × k, not rows × log(rows).
    "o3_topk_per_group_heap" -> { (s, dir) =>
      val topk = udaf(graft.functions.TopKAgg(3))
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_orderkey"), col("o_totalprice")).as("__top"))
        .select(col("o_custkey"), posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("o_custkey"), col("__e._1").as("o_orderkey"),
          col("__e._2").as("o_totalprice"),
          (col("__pos") + 1).cast("int").as("rn"))
    },

    // F13: salted sha256 (login-hash parity, reference viz.py:1209-1212).
    "f13_sha256" -> { (s, dir) =>
      Tables.customer(s, dir).select(col("c_custkey"),
        sha2(concat(lit("salt42|"), col("c_name")), 256).as("pwd_hash"))
    },

    // F15: age-in-years from a date-of-birth stand-in vs a fixed reference
    // date (explicit calendar arithmetic — portable, unlike months_between).
    "f15_age_years" -> { (s, dir) =>
      val dob = col("o_orderdate")
      Tables.orders(s, dir).filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          (lit(2026) - year(dob) -
            when(month(dob) > 1 || (month(dob) === 1 && dayofmonth(dob) > 1), 1)
              .otherwise(0)).cast("long").as("age_years"))
    },

    // F3: date + time-of-day → timestamp (stream start composition).
    "f3_datetime_combine" -> { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          unix_micros(to_timestamp(concat(
            date_format(col("o_orderdate"), "yyyy-MM-dd"), lit(" 08:30:00"))))
            .as("start_us"))
    },

    // A11: value-counts probe.
    "a11_value_counts" -> { (s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("n"))
    },

    // A12: exact quantiles (curation thresholds, e.g. quality-score P10
    // cutoffs). Spark `percentile` and DuckDB `quantile_cont` both use
    // linear interpolation over the sorted values.
    "a12_quantiles" -> { (s, dir) =>
      Tables.events(s, dir).agg(
        round(expr("percentile(value, 0.1)"), 6).as("p10"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
    },

    // A13: per-group exact quantiles (per-feature threshold seeding).
    "a13_group_quantiles" -> { (s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type")).agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
    },

    // L91 (sketch): per-group approx quantiles GATED — the exact p50 column
    // is cross-checked against DuckDB, and the approx side is asserted
    // against its own GK rank guarantee (rank of the returned value within
    // p ± 1/accuracy of the group size, +1 element of slack for ties at
    // the boundary): a broken digest flips the ok flags → hash mismatch.
    "sketch_group_quantiles" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val acc = 1000
      val approx = graft.ops.Sketches.approxGroupQuantiles(
        ev, "event_type", "value", Seq(0.5, 0.9), accuracy = acc)
      def rankOk(q: org.apache.spark.sql.Column, p: Double) = {
        val eps = 1.0 / acc
        val le = sum(when(col("value") <= q, 1L).otherwise(0L))
        val lt = sum(when(col("value") < q, 1L).otherwise(0L))
        val n = count(lit(1))
        (le >= floor(lit(p - eps) * n) - 1 &&
          lt <= ceil(lit(p + eps) * n) + 1).cast("int")
      }
      ev.join(broadcast(approx), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
          rankOk(col("q_0_5"), 0.5).as("ok_p50"),
          rankOk(col("q_0_9"), 0.9).as("ok_p90"))
    },

    // L92 (sketch): HLL++ distinct GATED — exact distinct cross-checked
    // against DuckDB; the HLL estimate asserted within 5×rsd of it (HLL
    // error is deterministic for fixed data, so the flag is stable).
    "sketch_hll_distinct" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("exact_distinct"),
        (abs(approx_count_distinct(col("user_id"), 0.05).cast("double") -
          countDistinct(col("user_id")).cast("double")) <=
          lit(0.25) * countDistinct(col("user_id")).cast("double") + lit(2.0))
          .cast("int").as("hll_ok"))
    },

    // L93 (sketch): bloom-prefiltered semi-join, EXACT end to end — the
    // fitted filter ships as a plan-time literal and prunes map-side (no
    // false negatives), the verify semi-join strips false positives, so
    // the result is exactly the plain semi-join DuckDB computes.
    "sketch_bloom_semijoin" -> { (s, dir) =>
      val cohort = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("user_id"))
      val bf = graft.ops.Sketches.bloomFit(cohort, "user_id",
        expectedItems = 100000L, numBits = 1L << 20)
      Tables.events(s, dir)
        .filter(graft.ops.Sketches.mightContain(bf, col("user_id")))
        .join(cohort, Seq("user_id"), "left_semi")
        .select(col("event_id"), col("user_id"), col("value"))
    },

    // W13: per-group winsorization — exact [p05, p95] clamp, broadcast
    // bounds, map-side saturation.
    "w13_winsorize" -> { (s, dir) =>
      graft.ops.Stats.winsorize(
          Tables.events(s, dir).select(col("event_id"), col("event_type"),
            col("value")),
          "value", "event_type", pLow = 0.05, pHigh = 0.95)
        .select(col("event_id"), col("event_type"), col("value"),
          col("value_wins"), col("clamped"))
    },

    // A16: ingest data-quality profile — nulls and cardinality per column
    // in one pass over the table.
    "profile_columns" -> { (s, dir) =>
      graft.ops.Stats.profile(Tables.events(s, dir),
        Seq("event_id", "user_id", "event_type", "value", "props"))
    },

    // A14: user-activity deciles via quantile THRESHOLDS, not a global
    // ntile — ntile needs every user through one reducer; thresholds are a
    // 1-row broadcast and the decile assignment is map-side arithmetic.
    "a14_activity_deciles" -> { (s, dir) =>
      val act = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val qs = (1 to 9).map(_ / 10.0).mkString(",")
      val bounds = act.agg(expr(s"percentile(n_events, array($qs))").as("__b"))
      val decile = (0 until 9).map(i =>
        when(col("n_events") > element_at(col("__b"), i + 1), 1).otherwise(0))
        .reduce(_ + _)
      act.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("n_events"),
          (lit(1) + decile).cast("int").as("decile"))
    },

    // F9: display-label formatting (snake_case → Title Case).
    "f9_label_format" -> { (s, dir) =>
      import graft.functions.TextFunctions.labelize
      Tables.part(s, dir).select(col("p_partkey"),
        labelize(col("p_type")).as("type_label"),
        labelize(regexp_replace(lower(col("p_name")), " ", "_")).as("name_label"))
    },

    // F7: string normalization pipeline (lower/replace/split_part/regexp).
    "f7_string_normalize" -> { (s, dir) =>
      Tables.part(s, dir).select(col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        regexp_replace(lower(col("p_name")), " ", "_").as("name_snake"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_first"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"))
    },

    // L92b (sketch): MERGEABLE HLL set algebra — pairwise audience
    // overlap between event types via Datasketches HLL union +
    // inclusion-exclusion (|A∩B| ≈ |A| + |B| − |A∪B|). The sketches are
    // fitted in ONE corpus pass and combined per pair as pure sketch
    // arithmetic on a T²-row frame — at 100 TB the exact intersection
    // computed here exists only as the gate's ground truth; production
    // keeps the per-type sketches as persisted artifacts and answers any
    // pairwise (or k-way, via repeated union) overlap without rescanning.
    // Gate shape follows sketch_hll_distinct: exact values hash-checked,
    // the estimate asserted within a deterministic bound via the ok flag.
    "sketch_hll_intersection" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val sk = ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("__sk"),
          countDistinct(col("user_id")).as("__nd"))
      val a = sk.select(col("event_type").as("type_a"), col("__sk").as("__ska"),
        col("__nd").as("__nda"))
      val b = sk.select(col("event_type").as("type_b"), col("__sk").as("__skb"),
        col("__nd").as("__ndb"))
      val est = a.join(broadcast(b), col("type_a") < col("type_b"))
        .withColumn("__estu",
          expr("hll_sketch_estimate(hll_union(__ska, __skb))"))
      val users = ev.distinct()
      val inter = users.select(col("event_type").as("type_a"), col("user_id"))
        .join(users.select(col("event_type").as("type_b"), col("user_id")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("__exact"))
      est.join(inter, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          coalesce(col("__exact"), lit(0L)).as("exact_inter"),
          (abs(col("__nda").cast("double") + col("__ndb").cast("double") -
            col("__estu") - coalesce(col("__exact"), lit(0L)).cast("double"))
            <= lit(0.25) * coalesce(col("__exact"), lit(0L)).cast("double") +
               lit(10.0))
            .cast("int").as("hll_ok"))
    }
  )

  def oracles: Map[String, String] = Map(
    "s1_full_scan" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id,
        |  event_type, value, props FROM events""".stripMargin,

    "s10_melt_wide_to_long" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  CAST(l_quantity AS DOUBLE) AS value FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,

    "a5_column_bounds" ->
      """SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  epoch_us(CAST(min(o_orderdate) AS TIMESTAMP)) AS min_date_us,
        |  epoch_us(CAST(max(o_orderdate) AS TIMESTAMP)) AS max_date_us
        |FROM orders""".stripMargin,

    "a6_distinct_values" ->
      "SELECT DISTINCT c_mktsegment FROM customer",

    "w12_zscore_per_user" ->
      """SELECT event_id,
        |  round((value - avg(value) OVER (PARTITION BY user_id)) /
        |    nullif(stddev_samp(value) OVER (PARTITION BY user_id), 0), 6) AS zscore
        |FROM events""".stripMargin,

    "w2_mean_calibration" ->
      """SELECT event_id,
        |  round(value / avg(value) OVER (PARTITION BY user_id), 6) AS calibrated
        |FROM events""".stripMargin,

    "w9_rolling_avg" ->
      """SELECT event_id,
        |  round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_avg
        |FROM events""".stripMargin,

    "o3_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey <= 100)
        |WHERE rn <= 3""".stripMargin,

    // Same ordering contract as o3_topk_per_group, whole key space.
    "o3_topk_per_group_heap" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "f13_sha256" ->
      "SELECT c_custkey, sha256('salt42|' || c_name) AS pwd_hash FROM customer",

    "f15_age_years" ->
      """SELECT o_orderkey,
        |  CAST(2026 - year(o_orderdate)
        |    - CASE WHEN month(o_orderdate) > 1
        |           OR (month(o_orderdate) = 1 AND day(o_orderdate) > 1)
        |      THEN 1 ELSE 0 END AS BIGINT) AS age_years
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,

    "f3_datetime_combine" ->
      """SELECT o_orderkey,
        |  epoch_us(CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 08:30:00' AS TIMESTAMP))
        |    AS start_us
        |FROM orders WHERE o_orderkey < 500""".stripMargin,

    "a11_value_counts" ->
      """SELECT event_type, value, count(*) AS n FROM events GROUP BY 1, 2""".stripMargin,

    "a12_quantiles" ->
      """SELECT round(quantile_cont(value, 0.1), 6) AS p10,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events""".stripMargin,

    "profile_columns" -> {
      val cols = Seq("event_id", "user_id", "event_type", "value", "props")
      cols.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) FILTER ($c IS NULL) AS n_null,
           |  count(DISTINCT $c) AS n_distinct FROM events""".stripMargin)
        .mkString("\nUNION ALL\n")
    },

    "a14_activity_deciles" -> {
      val cases = (1 to 9).map(i =>
        s"(CASE WHEN n_events > q[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      """WITH act AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
        |b AS (SELECT quantile_cont(n_events,
        |  [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q FROM act)
        |SELECT user_id, n_events, CAST(1 + """.stripMargin + cases +
        " AS INTEGER) AS decile\nFROM act, b"
    },

    "a13_group_quantiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY 1""".stripMargin,

    "sketch_group_quantiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |  1 AS ok_p50, 1 AS ok_p90
        |FROM events GROUP BY 1""".stripMargin,

    "sketch_hll_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
        |  1 AS hll_ok
        |FROM events GROUP BY 1""".stripMargin,

    "sketch_bloom_semijoin" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id IN (SELECT c_custkey FROM customer
        |                  WHERE c_mktsegment = 'BUILDING')""".stripMargin,

    "w13_winsorize" ->
      """WITH b AS (SELECT event_type,
        |    round(quantile_cont(value, 0.05), 6) AS lo,
        |    round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, value,
        |  round(least(greatest(value, lo), hi), 6) AS value_wins,
        |  CAST(value < lo OR value > hi AS INTEGER) AS clamped
        |FROM events e JOIN b USING (event_type)""".stripMargin,

    // DuckDB has no initcap: capitalize each lower-cased word by hand.
    "f9_label_format" ->
      """SELECT p_partkey,
        |  array_to_string(list_transform(
        |    string_split(replace(lower(p_type), '_', ' '), ' '),
        |    w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS type_label,
        |  array_to_string(list_transform(
        |    string_split(replace(lower(p_name), '_', ' '), ' '),
        |    w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS name_label
        |FROM part""".stripMargin,

    "f7_string_normalize" ->
      """SELECT p_partkey, lower(p_type) AS type_lc,
        |  replace(lower(p_name), ' ', '_') AS name_snake,
        |  split_part(p_type, ' ', 1) AS type_first,
        |  regexp_extract(p_name, '[a-z]+') AS first_word
        |FROM part""".stripMargin,

    "sketch_hll_intersection" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS exact_inter
        |  FROM u a JOIN u b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |t AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM (SELECT DISTINCT event_type FROM events) a,
        |       (SELECT DISTINCT event_type FROM events) b
        |  WHERE a.event_type < b.event_type)
        |SELECT type_a, type_b, coalesce(exact_inter, 0) AS exact_inter,
        |  1 AS hll_ok
        |FROM t LEFT JOIN p USING (type_a, type_b)""".stripMargin
  )
}
