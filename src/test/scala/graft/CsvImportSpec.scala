package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvImport

class CsvImportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzy mapping resolves the reference fixture names (F8)") {
    val csvCols = Seq("id", "end_date", "heart rate", "Calories_Burned",
      "Step Count", "gps_point", "unrelated_junk_zzz")
    val m = CsvImport.autoMap(csvCols,
      targets = Seq("user_id", "timestamp", "heart_rates", "calories", "steps"))
    assert(m("heart_rates").contains("heart rate"))
    assert(m("calories").contains("Calories_Burned"))
    assert(m("steps").contains("Step Count"))
    assert(m("user_id").contains("id"))
  }

  test("unmappable targets come back None below threshold") {
    val m = CsvImport.autoMap(Seq("zzz_qqq"), Seq("heart_rates"))
    assert(m("heart_rates").isEmpty)
  }

  test("wide CSV melts to cleansed, deduped long format (S5/S10/P9/U4)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "band.csv")
    // duplicate (u1, 12:00) row — first wins; zero/negative values cleansed.
    val csv =
      """id,end_date,heart_rate,calories
        |u1,2016-08-01 12:00:00,71.0,1.2
        |u1,2016-08-01 12:00:00,99.0,2.0
        |u1,2016-08-01 12:01:00,-5.0,0.0
        |u2,2016-08-01 12:00:00,80.0,3.3
        |""".stripMargin
    Files.writeString(f.toPath, csv)

    val wide = CsvImport.readWide(spark, f.getAbsolutePath)
    val long = CsvImport.toLongSeries(wide, "id", "end_date",
      Map("heart_rates" -> "heart_rate", "calories" -> "calories"))
      .select("user_id", "timestamp", "metric", "value")
      .as[(String, java.sql.Timestamp, String, Double)]
      .collect().sortBy(t => (t._1, t._2.getTime, t._3)).toSeq

    assert(long.map(t => (t._1, t._3, t._4)) == Seq(
      ("u1", "calories", 1.2),     // dup keeps first (1.2, not 2.0)
      ("u1", "heart_rates", 71.0), // dup keeps first (71, not 99)
      ("u2", "calories", 3.3),
      ("u2", "heart_rates", 80.0)
    )) // the (-5, 0) row is cleansed entirely
  }

  test("new-user upsert is an anti join (S12)") {
    val incoming = Seq("u1", "u2", "u3").toDF("user_id")
    val existing = Seq("u2").toDF("user_id")
    val got = CsvImport.newUsers(incoming, existing, "user_id")
      .as[String].collect().toSet
    assert(got == Set("u1", "u3"))
  }
}
