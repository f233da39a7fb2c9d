package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeoFunctions._

class GeoFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WKB encode matches the known little-endian POINT(1 2) vector") {
    // 01 (LE) + 01000000 (point) + 1.0d + 2.0d, all little-endian.
    val expected = "0101000000000000000000f03f0000000000000040"
    val got = Seq((1.0, 2.0)).toDF("lon", "lat")
      .select(wkbPointEncode(col("lon"), col("lat")).as("h"))
      .head().getString(0)
    assert(got == expected)
  }

  test("WKB decode inverts encode exactly (incl. negatives)") {
    val df = Seq((-118.2851, 34.0224), (0.0, -90.0), (179.999999, 0.000001))
      .toDF("lon", "lat")
    val bad = df.withColumn("hex", wkbPointEncode(col("lon"), col("lat")))
      .withColumn("pt", wkbPointDecode(col("hex")))
      .filter(col("pt.lon") =!= col("lon") || col("pt.lat") =!= col("lat"))
    assert(bad.count() == 0)
  }

  test("WKB decode returns null for malformed / non-point input") {
    val rows = Seq("zz", "", "0101000000ffff", // too short / junk
      "0102000000000000000000f03f0000000000000040") // type 2 = LINESTRING
      .toDF("hex")
      .select(wkbPointDecode(col("hex")).as("pt"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("decode handles big-endian WKB") {
    // 00 (BE) + 00000001 + BE doubles for (1.0, 2.0)
    val hex = "00000000013ff00000000000004000000000000000"
    val r = Seq(hex).toDF("hex").select(wkbPointDecode(col("hex")).as("pt")).head()
    val pt = r.getStruct(0)
    assert(pt.getDouble(0) == 1.0 && pt.getDouble(1) == 2.0)
  }

  test("SQL registration works") {
    register(spark)
    val r = spark.sql(
      "SELECT wkb_point_decode(wkb_point_encode(3.5d, -7.25d)) AS pt")
      .select(col("pt.lon"), col("pt.lat")).head()
    assert(r.getDouble(0) == 3.5 && r.getDouble(1) == -7.25)
  }

  test("odMatrix counts trips between first/last-point cells") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val pts = Seq(
      // u: starts in cell 0:0, ends in cell 2:0 (lon 0.12 / 0.05 = 2)
      ("u", t(100), 1L, 0.01, 0.01), ("u", t(200), 2L, 0.12, 0.01),
      // v: same flow
      ("v", t(100), 3L, 0.02, 0.02), ("v", t(300), 4L, 0.13, 0.02),
      // w: stationary → diagonal entry
      ("w", t(100), 5L, 0.01, 0.01), ("w", t(150), 6L, 0.02, 0.02)
    ).toDF("user_id", "ts", "event_id", "lon", "lat")
    val got = graft.ops.Trajectory.odMatrix(pts, "user_id", "ts", "event_id",
        "lon", "lat", cellDeg = 0.05)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("0:0", "2:0", 2L), ("0:0", "0:0", 1L)), got.toString)
  }

  test("coLocations: same bucket+cell within radius; far pair excluded") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // a and b co-located twice (~1.3 km apart, same bucket+cell);
    // c is in the same cell but ~5.5 km away (0.05° cell ≈ 5.6 km);
    // d shares the location but a DIFFERENT bucket.
    val pts = Seq(
      ("a", t(100), 0.001, 0.001), ("b", t(110), 0.011, 0.008),
      ("a", t(700), 0.001, 0.001), ("b", t(710), 0.011, 0.008),
      ("c", t(120), 0.049, 0.030),
      ("d", t(1300), 0.001, 0.001)
    ).toDF("user_id", "ts", "lon", "lat")
    val got = graft.ops.Trajectory.coLocations(pts, "user_id", "ts",
        "lon", "lat", bucketSec = 600L, cellDeg = 0.05, maxKm = 3.0)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L)), got.toString)
  }

  test("coLocations hot-block cap drops the crowded cell, keeps sparse cells exact") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // 5 users piled on one point (the crowd) + one genuine sparse pair.
    val crowd = (1 to 5).map(i => (s"crowd$i", t(100), 0.3, 0.3))
    val pair = Seq(("a", t(100), 0.001, 0.001), ("b", t(110), 0.011, 0.008))
    val pts = (crowd ++ pair).toDF("user_id", "ts", "lon", "lat")
    val capped = graft.ops.Trajectory.coLocations(pts, "user_id", "ts",
        "lon", "lat", bucketSec = 600L, cellDeg = 0.05, maxKm = 3.0,
        maxBlockRows = Some(4))
      .as[(String, String, Long)].collect().toSet
    assert(capped == Set(("a", "b", 1L)), capped.toString)
    val exact = graft.ops.Trajectory.coLocations(pts, "user_id", "ts",
        "lon", "lat", bucketSec = 600L, cellDeg = 0.05, maxKm = 3.0)
      .count()
    assert(exact == 1L + 10L) // the pair + C(5,2) crowd pairs
  }

  test("stayPoints: runs split on cell change; a revisit is a separate stay") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user u: 3 pts in cell (0,0), 1 pt in cell (1,0), 2 pts back in (0,0).
    // minPoints=2 keeps the first (3 pts, 20 s dwell) and last (2 pts) runs
    // as SEPARATE stays; the middle single point drops.
    val pts = Seq(
      ("u", t(100), 1L, 0.1, 0.1), ("u", t(110), 2L, 0.2, 0.2),
      ("u", t(120), 3L, 0.3, 0.1), ("u", t(130), 4L, 0.7, 0.1),
      ("u", t(140), 5L, 0.1, 0.3), ("u", t(150), 6L, 0.2, 0.2),
      ("v", t(100), 7L, 0.1, 0.1) // another user, below minPoints
    ).toDF("user_id", "ts", "event_id", "lon", "lat")
    val got = graft.ops.Trajectory.stayPoints(pts, "user_id", "ts", "lon",
        "lat", tiebreak = "event_id", cellDeg = 0.5, minPoints = 2)
      .orderBy("enter_us")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == Seq(("u", "0:0", 3L, 20L), ("u", "0:0", 2L, 10L)))
    // dwell floor removes the 10 s run
    val floored = graft.ops.Trajectory.stayPoints(pts, "user_id", "ts",
        "lon", "lat", tiebreak = "event_id", cellDeg = 0.5, minPoints = 2,
        minDwellS = 15L)
      .collect().map(_.getLong(5)).toSeq
    assert(floored == Seq(20L))
  }
}
