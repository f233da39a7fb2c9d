package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mets

class MetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("METs pipeline: default weight, calibration to mean 1.0, gap nulling") {
    // u1 has a weight (50 kg), u2 does not (falls back to 70 kg).
    // u1's 3rd sample is >0.5 day after the 2nd ⇒ the 2nd sample is nulled.
    val series = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 100.0),
      ("u1", ts("2024-01-01 01:00:00"), 200.0), // gap to next = 23h > 0.5d → null
      ("u1", ts("2024-01-02 00:00:00"), 300.0),
      ("u2", ts("2024-01-01 00:00:00"), 70.0),
      ("u2", ts("2024-01-01 00:30:00"), 140.0)
    ).toDF("user_id", "ts", "value")
    val weights = Seq(("u1", 50.0)).toDF("user_id", "weight")

    val out = Mets.calculate(series, weights, "user_id", "ts", "value")
      .select("user_id", "ts", "mets", "days_since_start")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    // u1 raw = value*4.186/50 → 8.372, 16.744, 25.116; mean = 16.744
    // calibrated = 0.5, 1.0, 1.5; sample 2 nulled by the forward gap.
    val u1 = out.filter(_._1 == "u1").map(_._3)
    assert(u1(0).contains(0.5))
    assert(u1(1).isEmpty)
    assert(u1(2).contains(1.5))

    // u2 default 70 kg: raw = 4.186, 8.372; mean = 6.279 → 2/3, 4/3.
    val u2 = out.filter(_._1 == "u2").map(_._3)
    assert(math.abs(u2(0).get - 2.0 / 3) < 1e-12)
    assert(math.abs(u2(1).get - 4.0 / 3) < 1e-12)

    // days_since_start: u1 = 0, 1/24, 1
    val d1 = out.filter(_._1 == "u1").map(_._4)
    assert(d1.toSeq == Seq(0.0, 1.0 / 24, 1.0))
  }

  test("per-user calibrated mean is 1.0 (ignoring nulls) on random-ish data") {
    val series = (1 to 50).map(i => ("u", ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i * 3.7))
      .toDF("user_id", "ts", "value")
    val weights = Seq(("u", 80.0)).toDF("user_id", "weight")
    val mean = Mets.calculate(series, weights, "user_id", "ts", "value")
      .agg(org.apache.spark.sql.functions.avg("mets")).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 1e-9)
  }
}
