package graft

import java.sql.Timestamp

/** Deterministic GeoMTS fixtures per FIXTURES.md §1–3: a subjects table with
  * nulls and missing weights, ~5-min-cadence heart-rate series over the
  * reference demo span (2016-08-01 →) with deliberate >0.5-day gaps and
  * outliers, and random-walk trajectories around USC aligned to the series
  * timestamps. Seeded RNG — identical on every run.
  */
object Fixtures {

  final case class User(user_id: String, age: Option[Int], height: Option[Double],
                        state_of_residence: Option[String], consent: Option[Boolean],
                        weight: Option[Double])

  val users: Seq[User] = {
    val rng = new scala.util.Random(42)
    val states = Seq("CA", "NY", "TX", "WA")
    (1 to 15).map { i =>
      val id = f"u$i%02d"
      User(id,
        age = if (i % 7 == 0) None else Some(20 + rng.nextInt(50)),
        height = if (i % 5 == 0) None else Some(1.5 + rng.nextDouble() * 0.5),
        state_of_residence = if (i % 6 == 0) None else Some(states(rng.nextInt(states.size))),
        consent = if (i % 4 == 0) None else Some(rng.nextBoolean()),
        weight = if (i % 3 == 0) None else Some(50.0 + rng.nextInt(50))) // every 3rd: 70kg default
    }
  }

  private val t0 = Timestamp.valueOf("2016-08-01 00:00:00").getTime

  /** (user_id, ts, bpm): 4 days at 5-min cadence; users u04/u08 have a
    * 0.75-day gap starting day 2; ~2% outliers at 200 bpm.
    */
  val heartRates: Seq[(String, Timestamp, Double)] = {
    val rng = new scala.util.Random(4242)
    users.flatMap { u =>
      (0 until (4 * 24 * 12)).flatMap { step =>
        val tMs = t0 + step * 5L * 60 * 1000
        val inGap = (u.user_id == "u04" || u.user_id == "u08") &&
          step >= 2 * 24 * 12 && step < (2 * 24 * 12 + (0.75 * 24 * 12).toInt)
        if (inGap) None
        else {
          val bpm = if (rng.nextInt(50) == 0) 200.0
                    else 60.0 + rng.nextInt(55) + rng.nextInt(100) / 100.0
          Some((u.user_id, new Timestamp(tMs), bpm))
        }
      }
    }
  }

  /** Random-walk points around USC (FIXTURES.md §3), one per heart-rate
    * sample, ~10 km radius.
    */
  val locations: Seq[(String, Timestamp, Double, Double)] = {
    val rng = new scala.util.Random(777)
    val byUser = heartRates.groupBy(_._1)
    byUser.toSeq.sortBy(_._1).flatMap { case (uid, rows) =>
      var lat = 34.0224; var lon = -118.2851
      rows.sortBy(_._2.getTime).map { case (_, ts, _) =>
        lat += (rng.nextDouble() - 0.5) * 0.002
        lon += (rng.nextDouble() - 0.5) * 0.002
        (uid, ts, lon, lat)
      }
    }
  }
}
