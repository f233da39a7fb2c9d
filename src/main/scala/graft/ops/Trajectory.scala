package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions.pointString

/** Trajectory assembly (SURVEY.md §2.5 W7, §2.9 G3–G4; reference
  * `viz.py:814-821`): per-user time-ordered point paths and start/end
  * extraction.
  *
  * Scale shape: `collect_list` of (ts, vertex) structs per user — one
  * shuffle keyed by user, sort happens per-group via `array_sort` on the
  * collected array (bounded by per-user trajectory length), NOT a global
  * sort. Endpoints avoid collection entirely (min_by/max_by aggregates).
  */
object Trajectory {

  /** Per-user path as "lon lat;lon lat;..." ordered by (ts, tiebreak). */
  def assemble(df: DataFrame, userCol: String, tsCol: String,
               lonCol: String, latCol: String, tiebreak: String): DataFrame =
    df.select(col(userCol),
      struct(col(tsCol), col(tiebreak),
        pointString(col(lonCol), col(latCol)).as("pt")).as("__v"))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(col("__v"))).as("__path"))
      .select(col(userCol),
        array_join(transform(col("__path"), v => v.getField("pt")), ";").as("path"),
        size(col("__path")).as("n_points"))

  /** Grid-cell signature of a trajectory: the DISTINCT set of spatial cells
    * the user visited (cell = floor(lon/cellDeg), floor(lat/cellDeg)).
    * Emits the (id, "shingle") shape shared with document shingle sets, so
    * trajectory similarity reuses [[Dedup.jaccardPairs]] unchanged —
    * set-similarity search over trajectories (cf. distributed top-k
    * trajectory similarity literature: signature-first, exact-verify).
    */
  def gridCells(df: DataFrame, userCol: String,
                lonCol: String, latCol: String, cellDeg: Double): DataFrame =
    graft.ops.Fan.out(df).select(col(userCol).as("doc_id"),
      concat(
        floor(col(lonCol) / lit(cellDeg)).cast("long").cast("string"), lit(":"),
        floor(col(latCol) / lit(cellDeg)).cast("long").cast("string")).as("shingle"))
      .distinct()

  /** Per-user trajectory path length: sum of consecutive planar
    * displacements over the (ts, tiebreak)-ordered points. The fold is
    * SEQUENTIAL over the sorted array — deterministic and engine-portable
    * (sqrt/×/± are IEEE-exact across engines; swap the step expression for
    * haversine when geodesic meters matter — transcendentals cost exact
    * cross-engine parity). Per-user state is bounded (a user's trajectory
    * fits a partition — same premise as the window family); the shuffle
    * carries one (ts, id, lon, lat) struct per point.
    */
  def pathLength(df: DataFrame, userCol: String, tsCol: String,
                 lonCol: String, latCol: String, tiebreak: String): DataFrame = {
    val pts = array_sort(collect_list(struct(col(tsCol), col(tiebreak),
      col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))))
    df.groupBy(col(userCol)).agg(pts.as("__p"))
      .select(col(userCol), size(col("__p")).cast("long").as("n_points"),
        round(when(size(col("__p")) > 1,
          aggregate(sequence(lit(2), size(col("__p"))), lit(0.0), (acc, i) => {
            val p = element_at(col("__p"), i)
            val q = element_at(col("__p"), i - 1)
            val dx = p.getField("lon") - q.getField("lon")
            val dy = p.getField("lat") - q.getField("lat")
            acc + sqrt(dx * dx + dy * dy)
          })).otherwise(lit(0.0)), 6).as("path_len"))
  }

  /** Stay-point detection, grid-cell run-length form (the distributable
    * simplification of Zheng et al.'s sequential stay-point scan — public
    * method): a stay is a maximal run of CONSECUTIVE points in the same
    * spatial cell along a user's (ts, tiebreak)-ordered trajectory; runs
    * meeting the point-count and dwell-time floors are emitted with their
    * enter/exit times. Gaps-and-islands via window functions: run starts
    * where the lagged cell differs, run id is the running sum of starts.
    *
    * Scale design: ONE exchange keyed by user for the window pass; the
    * (user, run) aggregation that follows is keyed by a superset of the
    * partition key, so per-user state never concentrates. No collect, no
    * per-group arrays — a million-point trajectory streams through the
    * sort-based window like any other.
    */
  def stayPoints(df: DataFrame, userCol: String, tsCol: String,
                 lonCol: String, latCol: String, tiebreak: String,
                 cellDeg: Double, minPoints: Int = 3,
                 minDwellS: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreak))
    val cell = concat(
      floor(col(lonCol) / lit(cellDeg)).cast("long").cast("string"), lit(":"),
      floor(col(latCol) / lit(cellDeg)).cast("long").cast("string"))
    val runs = df
      .withColumn("__cell", cell)
      .withColumn("__new",
        when(lag(col("__cell"), 1).over(w).isNull ||
          lag(col("__cell"), 1).over(w) =!= col("__cell"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    runs.groupBy(col(userCol), col("__run"), col("__cell"))
      .agg(unix_micros(min(col(tsCol))).as("enter_us"),
        unix_micros(max(col(tsCol))).as("exit_us"),
        count(lit(1)).as("n_points"))
      .withColumn("dwell_s", // µs-exact diff, floored once (not per endpoint)
        ((col("exit_us") - col("enter_us")) / lit(1000000L)).cast("long"))
      .filter(col("n_points") >= minPoints && col("dwell_s") >= minDwellS)
      .select(col(userCol), col("__cell").as("cell"), col("enter_us"),
        col("exit_us"), col("n_points"), col("dwell_s"))
  }

  /** G4: first/last vertex per user (no per-group ordering pass needed). */
  def endpoints(df: DataFrame, userCol: String, tsCol: String,
                lonCol: String, latCol: String): DataFrame =
    df.select(col(userCol), col(tsCol),
      pointString(col(lonCol), col(latCol)).as("__pt"))
      .groupBy(col(userCol))
      .agg(
        min_by(col("__pt"), col(tsCol)).as("start_point"),
        max_by(col("__pt"), col(tsCol)).as("end_point"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"))

  /** Great-circle (haversine) distance in km between a point column pair
    * and a fixed center — 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))
    * with R = 6371 km. The path-length ops above stay in planar degrees
    * for exact cross-engine parity; where geodesic METERS matter (radius
    * search, geofencing) the transcendentals are unavoidable, so the
    * formula is written in one fixed operation order and consumers round
    * the output (libm sin/cos differ by ≤1 ulp across engines — the same
    * accepted tolerance as the ln/exp-based text ops).
    */
  def haversineKm(latCol: org.apache.spark.sql.Column,
                  lonCol: org.apache.spark.sql.Column,
                  centerLat: Double, centerLon: Double)
      : org.apache.spark.sql.Column = {
    val dLat = radians(latCol - lit(centerLat))
    val dLon = radians(lonCol - lit(centerLon))
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lit(centerLat))) * cos(radians(latCol)) *
        pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** [[haversineKm]] between two point COLUMN pairs (same fixed operation
    * order; same ≤1-ulp cross-engine contract).
    */
  def haversinePairKm(lat1: org.apache.spark.sql.Column,
                      lon1: org.apache.spark.sql.Column,
                      lat2: org.apache.spark.sql.Column,
                      lon2: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** Origin–destination matrix: trip counts between the grid cells of
    * each user's FIRST and LAST point — the mobility-flow aggregate (the
    * endpoint extremes come from one [[endpoints]]-style struct min/max,
    * ties broken by `tieCol`; no per-user ordering pass). Output:
    * (origin_cell, dest_cell, n_users), cells as "x:y" strings at
    * `cellDeg` resolution.
    */
  def odMatrix(df: DataFrame, userCol: String, tsCol: String,
               tieCol: String, lonCol: String, latCol: String,
               cellDeg: Double): DataFrame = {
    def cell(lon: org.apache.spark.sql.Column,
             lat: org.apache.spark.sql.Column) =
      concat(floor(lon / lit(cellDeg)).cast("long").cast("string"), lit(":"),
        floor(lat / lit(cellDeg)).cast("long").cast("string"))
    val pt = struct(col(tsCol), col(tieCol), col(lonCol).as("__lon"),
      col(latCol).as("__lat"))
    df.groupBy(col(userCol))
      .agg(min(pt).as("__s"), max(pt).as("__e"))
      .select(cell(col("__s.__lon"), col("__s.__lat")).as("origin_cell"),
        cell(col("__e.__lon"), col("__e.__lat")).as("dest_cell"))
      .groupBy(col("origin_cell"), col("dest_cell"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Co-location detection: user pairs observed within `maxKm` of each
    * other in the same time bucket — the proximity-analytics primitive.
    * Candidates are BLOCKED on (time bucket, grid cell): the join is
    * equi-keyed on the block, never all-pairs, and the exact haversine
    * verifies survivors (the dedup candidate/verify shape, in space-time).
    * Same-cell blocking is the declared contract: a pair straddling a
    * cell boundary is not a candidate — size `cellDeg` ≥ the `maxKm`
    * radius so misses are boundary-only (or probe neighbor cells
    * upstream for exactness).
    *
    * Output: (user_a, user_b, n_moments) — distinct co-located buckets
    * per pair. The distance filter runs on the RAW haversine (the
    * [[withinRadius]] inclusion discipline).
    *
    * `maxBlockRows` is the hot-block guard (the edit-distance blocking
    * discipline): a (bucket, cell) block with more rows than the cap is
    * DROPPED — its pair space is quadratic in exactly the stadium-crowd
    * case where pairwise proximity stops being informative; re-run those
    * cells at finer `cellDeg` when they matter. None = exact.
    */
  def coLocations(df: DataFrame, userCol: String, tsCol: String,
                  lonCol: String, latCol: String, bucketSec: Long,
                  cellDeg: Double, maxKm: Double,
                  maxBlockRows: Option[Int] = None): DataFrame =
    coLocationMoments(df, userCol, tsCol, lonCol, latCol, bucketSec,
      cellDeg, maxKm, maxBlockRows)
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_moments"))

  /** The TIMED contact edges behind [[coLocations]]: one row per
    * distinct (user_a, user_b, bucket) co-located moment — the edge list
    * a time-respecting analysis ([[Graph.temporalReachability]]) feeds
    * on, where the aggregate pair counts would lose the event times.
    * Same blocking/verify semantics and parameters as [[coLocations]].
    */
  def coLocationMoments(df: DataFrame, userCol: String, tsCol: String,
                        lonCol: String, latCol: String, bucketSec: Long,
                        cellDeg: Double, maxKm: Double,
                        maxBlockRows: Option[Int] = None): DataFrame = {
    val buckUs = lit(bucketSec * 1000000L)
    val us = unix_micros(col(tsCol))
    // r16 opt: fan the single-file event scan out before the bucket/cell
    // projection (Fan.out scaladoc) — the blocking join's feed otherwise
    // builds in one task; everything downstream is joins, integer counts
    // and DISTINCT pair emission, so partial order is immaterial.
    val df2 = graft.ops.Fan.out(df)
    // Exact bucket index: subtract the remainder first so the double
    // division is between exact multiples (a raw trunc(us / b) can land
    // a half-ulp across the integer boundary DuckDB's `//` floors to).
    val pts = df2.select(col(userCol).as("__u"),
      ((us - pmod(us, buckUs)) / buckUs).cast("long").as("__bucket"),
      concat(floor(col(lonCol) / lit(cellDeg)).cast("long").cast("string"),
        lit(":"),
        floor(col(latCol) / lit(cellDeg)).cast("long").cast("string"))
        .as("__cell"),
      col(lonCol).as("__lon"), col(latCol).as("__lat"))
    val gated = maxBlockRows.fold(pts) { cap =>
      val ok = pts.groupBy(col("__bucket"), col("__cell"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= cap)
        .select(col("__bucket"), col("__cell"))
      pts.join(ok, Seq("__bucket", "__cell"), "left_semi")
    }
    val a = gated.select(col("__u").as("user_a"), col("__bucket"),
      col("__cell"), col("__lon").as("__lon_a"), col("__lat").as("__lat_a"))
    val b = gated.select(col("__u").as("user_b"), col("__bucket"),
      col("__cell"), col("__lon").as("__lon_b"), col("__lat").as("__lat_b"))
    a.join(b, Seq("__bucket", "__cell"))
      .filter(col("user_a") < col("user_b"))
      .filter(haversinePairKm(col("__lat_a"), col("__lon_a"),
        col("__lat_b"), col("__lon_b")) <= maxKm)
      .select(col("user_a"), col("user_b"), col("__bucket").as("bucket"))
      .distinct()
  }

  /** Radius search: points within `radiusKm` of the center, with their
    * distance — one map-side predicate over the scan (at scale, pair
    * with a Z-order/grid layout so the bounding-box pre-filter prunes
    * files BEFORE the transcendental runs on survivors).
    */
  def withinRadius(points: DataFrame, idCol: String, latCol: String,
                   lonCol: String, centerLat: Double, centerLon: Double,
                   radiusKm: Double): DataFrame = {
    // Filter on the RAW distance (≤1 ulp across engines; a rounded-value
    // filter would inherit round()'s shortest-repr divergence for the
    // inclusion decision itself), round only the emitted column.
    val d = haversineKm(col(latCol), col(lonCol), centerLat, centerLon)
    points.filter(d <= radiusKm)
      .select(col(idCol), round(d, 4).as("dist_km"))
  }
}
