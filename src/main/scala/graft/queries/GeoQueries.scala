package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._
import graft.ops.Trajectory
import graft.sources.Tables

/** Geospatial queries (SURVEY.md §2.9). Points are synthesized
  * deterministically from the events table (lon from `value`, lat from the
  * JSON `props.k`) — the testdata has no native geo column, and this also
  * exercises the JSON-extraction path (stream payload decode, §2.8).
  *
  * Vertex strings use fixed 6-decimal formatting; the derivations keep ≤4
  * decimal digits so Java's HALF_UP and C's half-even formatting agree.
  */
object GeoQueries {

  type Q = (SparkSession, String) => DataFrame

  private def withPoints(ev: DataFrame): DataFrame =
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("lon", lit(-118.0) + col("value") / lit(100))
      .withColumn("lat", lit(34.0) + col("k").cast("double") / lit(100.0))

  private val ptsCte =
    """pts AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  -118.0 + value/100 AS lon,
      |  34.0 + CAST(json_extract_string(props, '$.k') AS BIGINT)/100.0 AS lat
      |  FROM events)""".stripMargin

  def defs: Map[String, Q] = Map(
    // W7/G3: per-user time-ordered trajectory assembly.
    "g3_trajectory_assembly" -> { (s, dir) =>
      Trajectory.assemble(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "lon", "lat", tiebreak = "event_id")
    },

    // G7 (beyond ref): haversine radius search around a fixed center.
    "g7_radius_search" -> { (s, dir) =>
      Trajectory.withinRadius(withPoints(Tables.events(s, dir)),
        "event_id", "lat", "lon",
        centerLat = 34.5, centerLon = -117.5, radiusKm = 30.0)
    },

    // G8 (beyond ref): origin–destination flow matrix between 0.05°
    // endpoint grid cells.
    "g8_od_matrix" -> { (s, dir) =>
      Trajectory.odMatrix(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "event_id", "lon", "lat", cellDeg = 0.05)
    },

    // G9 (beyond ref): co-location pairs — same 10-minute bucket, same
    // 0.05° cell, within 3 km (blocked candidates + exact haversine
    // verify; the dedup candidate/verify shape in space-time).
    "g9_colocation_pairs" -> { (s, dir) =>
      Trajectory.coLocations(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "lon", "lat", bucketSec = 600L, cellDeg = 0.05,
        maxKm = 3.0)
    },

    // G10 (beyond ref): time-respecting contact tracing — 3 hops over
    // the co-location moment edges from seed users {1, 2}; a hop only
    // transmits through contacts at non-decreasing bucket times.
    "g10_contact_chains" -> { (s, dir) =>
      val moments = Trajectory.coLocationMoments(
        withPoints(Tables.events(s, dir)), "user_id", "ts", "lon", "lat",
        bucketSec = 600L, cellDeg = 0.05, maxKm = 3.0)
      graft.ops.Graph.temporalReachability(moments, "user_a", "user_b",
        "bucket", seeds = Seq(1L, 2L), hops = 3)
    },

    // Skew stress: a third of all events relocate to ONE point (the
    // stadium crowd), and the hot-block cap (50 rows per bucket×cell)
    // drops those quadratic blocks while sparse cells stay exact.
    "skew_stress_colocation" -> { (s, dir) =>
      val hot = pmod(col("event_id"), lit(3)) === 0
      val pts = withPoints(Tables.events(s, dir))
        .withColumn("lon", when(hot, lit(-117.123)).otherwise(col("lon")))
        .withColumn("lat", when(hot, lit(34.567)).otherwise(col("lat")))
      Trajectory.coLocations(pts, "user_id", "ts", "lon", "lat",
        bucketSec = 600L, cellDeg = 0.05, maxKm = 3.0,
        maxBlockRows = Some(50))
    },

    // G4: start/end vertex per user.
    "g4_trajectory_endpoints" -> { (s, dir) =>
      Trajectory.endpoints(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "lon", "lat")
    },

    // G5+: per-user planar path length (ordered sequential fold).
    "g5_path_length" -> { (s, dir) =>
      Trajectory.pathLength(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "lon", "lat", tiebreak = "event_id")
    },

    // F11/G2: WKT POINT encoding.
    "g2_wkt_encode" -> { (s, dir) =>
      withPoints(Tables.events(s, dir))
        .select(col("event_id"), wktPoint(col("lon"), col("lat")).as("wkt"))
    },

    // F10/G2: WKB hex round-trip through the custom Catalyst expressions.
    // DuckDB cannot decode WKB, but it doesn't need to: encode→decode is
    // bit-exact IEEE754, so emitting the DECODED coordinates against an
    // oracle that derives lon/lat directly gives a full three-way check —
    // any encode or decode bug breaks the hash.
    "g2_wkb_roundtrip" -> { (s, dir) =>
      withPoints(Tables.events(s, dir))
        .withColumn("decoded",
          wkbPointDecode(wkbPointEncode(col("lon"), col("lat"))))
        .select(col("event_id"),
          col("decoded").getField("lon").as("lon"),
          col("decoded").getField("lat").as("lat"))
    },

    // G6+: stay-point detection — maximal same-cell runs along each user's
    // ordered trajectory with point-count/dwell floors (grid-cell
    // run-length form of the classic stay-point scan). cellDeg tuned to
    // the testdata's spatial spread (0.5° ⇒ 48 stays at sf0.001, ~430 at
    // sf0.01) so the gate compares actual rows.
    "g6_stay_points" -> { (s, dir) =>
      Trajectory.stayPoints(withPoints(Tables.events(s, dir)),
        "user_id", "ts", "lon", "lat", tiebreak = "event_id",
        cellDeg = 0.5, minPoints = 3)
    },

    // Trajectory similarity: grid-cell Jaccard between users' paths,
    // UNCAPPED over the full user population. Routed through the exact
    // prefix-filtered join (Dedup.jaccardPairsPrefix): candidates come
    // only from rare-cell prefixes, so a hot cell every user visits never
    // routes the population through one reducer — the output is still the
    // EXACT set of pairs with Jaccard ≥ 0.3 (prefix filtering is
    // lossless), which is what the all-pairs DuckDB oracle computes.
    "traj_similarity_grid" -> { (s, dir) =>
      val cells = graft.ops.Trajectory.gridCells(
        withPoints(Tables.events(s, dir)),
        "user_id", "lon", "lat", cellDeg = 0.1)
      graft.ops.Dedup.jaccardPairsPrefix(cells, "doc_id", minJaccard = 0.3)
        .select(col("doc_a").as("user_a"), col("doc_b").as("user_b"),
          col("inter"), round(col("jaccard"), 6).as("jaccard"))
    },

    // F16/JSON: stream-payload style JSON field extraction.
    "f_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          (col("value") * get_json_object(col("props"), "$.k").cast("long"))
            .as("weighted"))
    }
  )

  def oracles: Map[String, String] = Map(
    // Haversine in the op's exact operation order; the FILTER runs on
    // the raw distance (round only the emitted column — a rounded-value
    // filter would make inclusion itself rounding-divergent).
    // Endpoint extremes mirror the engine's struct min/max on (ts,
    // event_id); cells floor at 0.05°.
    "g8_od_matrix" ->
      s"""WITH $ptsCte,
         |r AS (SELECT user_id, lon, lat,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rs,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS re
         |  FROM pts),
         |ends AS (SELECT s.user_id,
         |    CAST(floor(s.lon / 0.05) AS BIGINT) || ':' ||
         |      CAST(floor(s.lat / 0.05) AS BIGINT) AS origin_cell,
         |    CAST(floor(e.lon / 0.05) AS BIGINT) || ':' ||
         |      CAST(floor(e.lat / 0.05) AS BIGINT) AS dest_cell
         |  FROM (SELECT * FROM r WHERE rs = 1) s
         |  JOIN (SELECT * FROM r WHERE re = 1) e USING (user_id))
         |SELECT origin_cell, dest_cell, CAST(count(*) AS BIGINT) AS n_users
         |FROM ends GROUP BY 1, 2""".stripMargin,

    // Same-bucket/same-cell blocking, raw-haversine verify, distinct
    // bucket count per pair.
    "g9_colocation_pairs" ->
      s"""WITH $ptsCte,
         |p AS (SELECT user_id, epoch_us(ts) // 600000000 AS bucket,
         |    CAST(floor(lon / 0.05) AS BIGINT) || ':' ||
         |      CAST(floor(lat / 0.05) AS BIGINT) AS cell,
         |    lon, lat
         |  FROM pts),
         |cand AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
         |    a.bucket,
         |    12742.0 * asin(sqrt(pow(sin(radians(b.lat - a.lat) / 2), 2)
         |      + cos(radians(a.lat)) * cos(radians(b.lat))
         |        * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist
         |  FROM p a JOIN p b
         |    ON a.bucket = b.bucket AND a.cell = b.cell
         |      AND a.user_id < b.user_id)
         |SELECT user_a, user_b,
         |  CAST(count(DISTINCT bucket) AS BIGINT) AS n_moments
         |FROM cand WHERE dist <= 3.0 GROUP BY 1, 2""".stripMargin,

    // Unrolled hops; frontier = "minimal arrival improved this round";
    // seeds carry arrival −2⁶³ (any contact transmits) and null out in
    // the report.
    "g10_contact_chains" -> {
      val hops = 3
      val base =
        s"""WITH $ptsCte,
           |p AS (SELECT user_id, epoch_us(ts) // 600000000 AS bucket,
           |    CAST(floor(lon / 0.05) AS BIGINT) || ':' ||
           |      CAST(floor(lat / 0.05) AS BIGINT) AS cell,
           |    lon, lat
           |  FROM pts),
           |mom AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub,
           |    a.bucket AS t
           |  FROM p a JOIN p b
           |    ON a.bucket = b.bucket AND a.cell = b.cell
           |      AND a.user_id < b.user_id
           |  WHERE 12742.0 * asin(sqrt(pow(sin(radians(b.lat - a.lat) / 2), 2)
           |      + cos(radians(a.lat)) * cos(radians(b.lat))
           |        * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 3.0),
           |sym AS (SELECT ua AS a, ub AS b, t FROM mom
           |  UNION ALL SELECT ub, ua, t FROM mom),
           |best0(node, hop, arr) AS (
           |  VALUES (1, 0, -9223372036854775808), (2, 0, -9223372036854775808)),
           |f0 AS (SELECT node, arr FROM best0)""".stripMargin
      val steps = (1 to hops).map { h =>
        s""",
           |cand$h AS (SELECT e.b AS node, min(e.t) AS c
           |  FROM f${h - 1} f JOIN sym e ON f.node = e.a AND e.t >= f.arr
           |  GROUP BY 1),
           |imp$h AS (SELECT c.node, c.c AS arr, coalesce(b.hop, $h) AS hop
           |  FROM cand$h c LEFT JOIN best${h - 1} b ON c.node = b.node
           |  WHERE b.node IS NULL OR c.c < b.arr),
           |best$h AS (SELECT b.node, b.hop,
           |    CASE WHEN i.arr IS NOT NULL AND i.arr < b.arr THEN i.arr
           |      ELSE b.arr END AS arr
           |  FROM best${h - 1} b LEFT JOIN imp$h i ON b.node = i.node
           |  UNION ALL
           |  SELECT i.node, i.hop, i.arr FROM imp$h i
           |  LEFT JOIN best${h - 1} b ON i.node = b.node WHERE b.node IS NULL),
           |f$h AS (SELECT node, arr FROM imp$h)""".stripMargin
      }.mkString
      base + steps +
        s"""\nSELECT CAST(node AS BIGINT) AS node, CAST(hop AS INTEGER) AS hop,
           |  CASE WHEN hop > 0 THEN arr END AS first_time
           |FROM best$hops""".stripMargin
    },

    "skew_stress_colocation" ->
      s"""WITH $ptsCte,
         |hp AS (SELECT user_id, ts,
         |    CASE WHEN event_id % 3 = 0 THEN -117.123 ELSE lon END AS lon,
         |    CASE WHEN event_id % 3 = 0 THEN 34.567 ELSE lat END AS lat
         |  FROM pts),
         |p AS (SELECT user_id, epoch_us(ts) // 600000000 AS bucket,
         |    CAST(floor(lon / 0.05) AS BIGINT) || ':' ||
         |      CAST(floor(lat / 0.05) AS BIGINT) AS cell,
         |    lon, lat,
         |    count(*) OVER (PARTITION BY epoch_us(ts) // 600000000,
         |      CAST(floor(lon / 0.05) AS BIGINT) || ':' ||
         |        CAST(floor(lat / 0.05) AS BIGINT)) AS bn
         |  FROM hp),
         |g AS (SELECT * FROM p WHERE bn <= 50),
         |cand AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
         |    a.bucket,
         |    12742.0 * asin(sqrt(pow(sin(radians(b.lat - a.lat) / 2), 2)
         |      + cos(radians(a.lat)) * cos(radians(b.lat))
         |        * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist
         |  FROM g a JOIN g b
         |    ON a.bucket = b.bucket AND a.cell = b.cell
         |      AND a.user_id < b.user_id)
         |SELECT user_a, user_b,
         |  CAST(count(DISTINCT bucket) AS BIGINT) AS n_moments
         |FROM cand WHERE dist <= 3.0 GROUP BY 1, 2""".stripMargin,

    "g7_radius_search" ->
      s"""WITH $ptsCte,
         |d AS (SELECT event_id,
         |  12742.0 * asin(sqrt(pow(sin(radians(lat - 34.5) / 2), 2)
         |    + cos(radians(34.5)) * cos(radians(lat))
         |      * pow(sin(radians(lon - (-117.5)) / 2), 2))) AS dist
         |  FROM pts)
         |SELECT event_id, round(dist, 4) AS dist_km FROM d
         |WHERE dist <= 30.0""".stripMargin,

    "g6_stay_points" ->
      s"""WITH $ptsCte,
         |c AS (SELECT user_id, event_id, ts,
         |  CAST(floor(lon/0.5) AS BIGINT) || ':' ||
         |  CAST(floor(lat/0.5) AS BIGINT) AS cell FROM pts),
         |r AS (SELECT *, CASE WHEN lag(cell) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) IS DISTINCT FROM cell
         |  THEN 1 ELSE 0 END AS nr FROM c),
         |runs AS (SELECT *, sum(nr) OVER (PARTITION BY user_id
         |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id FROM r)
         |SELECT user_id, cell, epoch_us(min(ts)) AS enter_us,
         |  epoch_us(max(ts)) AS exit_us, count(*) AS n_points,
         |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dwell_s
         |FROM runs GROUP BY user_id, run_id, cell
         |HAVING count(*) >= 3""".stripMargin,

    "g3_trajectory_assembly" ->
      s"""WITH $ptsCte
         |SELECT user_id,
         |  string_agg(printf('%.6f', lon) || ' ' || printf('%.6f', lat), ';'
         |    ORDER BY ts, event_id) AS path,
         |  CAST(count(*) AS INTEGER) AS n_points
         |FROM pts GROUP BY user_id""".stripMargin,

    "g4_trajectory_endpoints" ->
      s"""WITH $ptsCte
         |SELECT user_id,
         |  arg_min(printf('%.6f', lon) || ' ' || printf('%.6f', lat), ts) AS start_point,
         |  arg_max(printf('%.6f', lon) || ' ' || printf('%.6f', lat), ts) AS end_point,
         |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
         |FROM pts GROUP BY user_id""".stripMargin,

    "g5_path_length" ->
      s"""WITH $ptsCte,
         |p AS (SELECT user_id,
         |  list(struct_pack(lon := lon, lat := lat) ORDER BY ts, event_id) AS l
         |  FROM pts GROUP BY 1)
         |SELECT user_id, CAST(len(l) AS BIGINT) AS n_points,
         |  round(CASE WHEN len(l) > 1 THEN
         |    list_sum(list_transform(range(2, len(l) + 1), i ->
         |      sqrt((l[i].lon - l[i-1].lon) * (l[i].lon - l[i-1].lon) +
         |           (l[i].lat - l[i-1].lat) * (l[i].lat - l[i-1].lat))))
         |  ELSE 0.0 END, 6) AS path_len
         |FROM p""".stripMargin,

    "g2_wkt_encode" ->
      s"""WITH $ptsCte
         |SELECT event_id,
         |  'POINT(' || printf('%.6f', lon) || ' ' || printf('%.6f', lat) || ')' AS wkt
         |FROM pts""".stripMargin,

    "g2_wkb_roundtrip" ->
      s"""WITH $ptsCte
         |SELECT event_id, lon, lat FROM pts""".stripMargin,

    "traj_similarity_grid" ->
      s"""WITH $ptsCte,
         |cells AS (SELECT DISTINCT user_id,
         |  CAST(CAST(floor(lon / 0.1) AS BIGINT) AS VARCHAR) || ':' ||
         |  CAST(CAST(floor(lat / 0.1) AS BIGINT) AS VARCHAR) AS cell FROM pts),
         |sz AS (SELECT user_id, count(*) AS sz FROM cells GROUP BY 1),
         |inter AS (SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS inter
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.user_id < b.user_id
         |  GROUP BY 1, 2)
         |SELECT i.user_a, i.user_b, i.inter,
         |  round(CAST(i.inter AS DOUBLE) / (x.sz + y.sz - i.inter), 6) AS jaccard
         |FROM inter i JOIN sz x ON i.user_a = x.user_id
         |JOIN sz y ON i.user_b = y.user_id
         |WHERE CAST(i.inter AS DOUBLE) / (x.sz + y.sz - i.inter) >= 0.3""".stripMargin,

    "f_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  value * CAST(json_extract_string(props, '$.k') AS BIGINT) AS weighted
        |FROM events""".stripMargin
  )
}
