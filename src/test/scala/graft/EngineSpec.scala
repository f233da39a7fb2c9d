package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.ops.CohortFilter
import graft.ops.Multimodal

class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("QuerySpec JSON round-trip preserves every field") {
    val spec = QuerySpec(
      subjectSelection = ByAttributes(Seq(
        CohortFilter.NumericRange("age", 20, 50, nullOk = false),
        CohortFilter.CategoricalIn("state", Seq("CA", "NY")))),
      controlSelection = ByIds("user_id", Seq("u1", "u2")),
      startDate = "2016-08-01", endDate = "2016-08-14",
      realTime = true, windowSizeSec = 120, fastForward = 3600.0)
    val back = QuerySpec.fromJson(spec.toJson)
    assert(back == spec)
  }

  test("default time-of-day ranges match the reference (viz.py:542-547)") {
    val spec = QuerySpec(AllUsers, AllUsers, "2016-08-01", "2016-08-14")
    assert(spec.timeOfDayRanges.map(_.label) == Seq("Workout", "Afternoon", "Sleep"))
    assert(spec.timeOfDayRanges.last.start > spec.timeOfDayRanges.last.end) // wraps
  }

  test("config-driven schemas build the reference layout (§1.2)") {
    import graft.model.ConfigSchema._
    val cfg = GeomtsConfig()
    assert(cfg.subjectsSchema.fieldNames.head == "user_id")
    assert(cfg.seriesSchema.fieldNames.toSeq == Seq("user_id", "timestamp", "value"))
    assert(cfg.geoSchema.fields.last.dataType.typeName == "struct")
    intercept[IllegalArgumentException] { attrType("decimal") }
  }

  test("multimodal decode is partition-wise and null-safe") {
    val media = Seq(
      (1L, "hello world".getBytes("UTF-8"), "image/fake"),
      (2L, null.asInstanceOf[Array[Byte]], "image/fake")
    ).toDF("media_id", "payload", "mime").repartition(2)
    val got = Multimodal.decodeImageMeta(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 11L) // n_bytes
    assert(got(1L).getInt(2) == 64 + 11 % 512)
    assert(got(2L).isNullAt(2)) // null payload → null dims, not a crash
  }

  test("frame sampling explodes indices without decoding") {
    val media = Seq((1L, Array.fill[Byte](25)(7))).toDF("media_id", "payload")
    val frames = Multimodal.frameSample(media, fps = 30, everyNthFrame = 10)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 10, 20)) // n_frames = 25 % 1000 + 1 = 26
  }
}
