package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SeriesOps

class SeriesOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("date range is day-granular and inclusive on both bounds (S2)") {
    val df = Seq(
      ("a", ts("2024-01-04 23:59:59")), // before
      ("b", ts("2024-01-05 00:00:00")), // first instant of start day
      ("c", ts("2024-01-06 12:00:00")),
      ("d", ts("2024-01-07 23:59:59")), // last instant of end day
      ("e", ts("2024-01-08 00:00:00"))  // after
    ).toDF("id", "t")
    val got = SeriesOps.dateRange(df, "t", "2024-01-05", "2024-01-07")
      .select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("b", "c", "d"))
  }

  test("time-of-day slice crosses midnight (P11, sleep 20:00-04:45)") {
    val df = Seq(
      ("evening", ts("2024-01-05 20:00:00")),
      ("midnight", ts("2024-01-06 00:00:00")),
      ("early", ts("2024-01-06 04:45:00")),
      ("late_morning", ts("2024-01-06 04:45:01")),
      ("noon", ts("2024-01-06 12:00:00")),
      ("pre_evening", ts("2024-01-06 19:59:59"))
    ).toDF("id", "t")
    val got = SeriesOps.timeOfDayRange(df, "t", "20:00:00", "04:45:00")
      .select("id").as[String].collect().toSet
    assert(got == Set("evening", "midnight", "early"))
  }

  test("non-wrapping time-of-day slice behaves as plain between") {
    val df = Seq(("in", ts("2024-01-05 07:00:00")), ("out", ts("2024-01-05 10:00:00")))
      .toDF("id", "t")
    val got = SeriesOps.timeOfDayRange(df, "t", "06:45:00", "09:30:00")
      .select("id").as[String].collect().toSeq
    assert(got == Seq("in"))
  }

  test("dedup keeps the first row by tiebreak (U4 keep-first)") {
    val df = Seq(
      ("u1", 100L, 1L, 10.0), // dup group: keep tiebreak 1
      ("u1", 100L, 2L, 20.0),
      ("u1", 200L, 3L, 30.0),
      ("u2", 100L, 4L, 40.0)
    ).toDF("user_id", "bucket", "seq", "value")
    val got = SeriesOps.dedupKeepFirst(df, Seq("user_id", "bucket"), "seq")
      .orderBy("user_id", "bucket")
      .select("user_id", "bucket", "seq", "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("u1", 100L, 1L, 10.0), ("u1", 200L, 3L, 30.0), ("u2", 100L, 4L, 40.0)))
  }

  test("as-of join attaches latest prior right value, exact ties, tolerance") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("u1", ts("2024-01-01 12:00:00"), 2L, 200.0), // exact tie with right
      ("u1", ts("2024-01-01 20:00:00"), 3L, 300.0), // right too old (tolerance)
      ("u2", ts("2024-01-01 10:00:00"), 4L, 400.0)  // no right at all
    ).toDF("user_id", "t", "event_id", "value")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 9.5),
      ("u1", ts("2024-01-01 12:00:00"), 12.0)
    ).toDF("user_id", "t", "value")
    val got = graft.ops.SeriesOps.asofJoinBackward(left, right, "user_id", "t",
        Seq("event_id", "value"), "value", toleranceSec = Some(3600L))
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(9.5))   // latest prior within 1 h
    assert(got(2L).contains(12.0))  // exact-timestamp right IS visible
    assert(got(3L).isEmpty)         // 8 h gap exceeds tolerance
    assert(got(4L).isEmpty)         // user with no right rows
  }

  test("trailing window anchors at the latest event time, not wall clock (W6)") {
    val df = Seq(
      ("old", ts("2024-01-01 00:00:00")),
      ("edge", ts("2024-01-02 00:00:00")), // exactly max-86400s
      ("new", ts("2024-01-03 00:00:00"))
    ).toDF("id", "t")
    val got = SeriesOps.trailingWindow(df, "t", 86400L)
      .select("id").as[String].collect().toSet
    assert(got == Set("edge", "new"))
  }

  test("rangeJoinBucketed: [start,end) bounds, bucket-width invariance, inverted guard (L162)") {
    val pts = Seq(5L, 10L, 19L, 20L, 35L, 99L).map(Tuple1(_)).toDF("ts_us")
    val iv = Seq(
      (1L, 10L, 20L),  // hits 10, 19; NOT 20 (end exclusive) or 5
      (2L, 0L, 6L),    // hits 5
      (3L, 30L, 30L),  // degenerate: end == start -> nothing
      (4L, 50L, 40L)   // inverted: must vanish, not explode backwards
    ).toDF("iv_id", "s_us", "e_us")
    def run(bucket: Long) =
      SeriesOps.rangeJoinBucketed(pts, iv, "ts_us", "s_us", "e_us", bucket)
        .select("iv_id", "ts_us").as[(Long, Long)].collect().toSet
    val expect = Set((1L, 10L), (1L, 19L), (2L, 5L))
    assert(run(7L) == expect)
    // The bucket width is a PERFORMANCE knob only — any width gives the
    // same rows (the exact bounds filter runs after the bucket join).
    for (b <- Seq(1L, 3L, 100L, 1000000L)) assert(run(b) == expect, s"bucket=$b")
  }

  test("windowed funnel: greedy chain, order enforcement, window cutoff") {
    import graft.ops.Funnel
    val ev = Seq(
      // u1 full conversion within window
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:20:00"),
      (1L, "purchase", "2024-01-01 10:40:00"),
      // u2 purchase BEFORE click → chain stops at level 2
      (2L, "view", "2024-01-01 10:00:00"), (2L, "purchase", "2024-01-01 10:30:00"),
      (2L, "click", "2024-01-01 11:00:00"),
      // u3 purchase outside the 1 h window of the FIRST view
      (3L, "view", "2024-01-01 10:00:00"), (3L, "click", "2024-01-01 10:20:00"),
      (3L, "purchase", "2024-01-01 11:30:00"),
      // u4 only clicks (no stage-1) → level 0
      (4L, "click", "2024-01-01 09:00:00"),
      // u5 greedy t1 = EARLIEST view; the later view would convert but
      // greedy-earliest semantics pin the window to the first
      (5L, "view", "2024-01-01 08:00:00"), (5L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-01 10:10:00"), (5L, "purchase", "2024-01-01 10:20:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val got = Funnel.windowedFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 3600L)
      .select("user_id", "funnel_level", "converted")
      .as[(Long, Int, Boolean)].collect()
      .map { case (u, l, c) => u -> ((l, c)) }.toMap
    assert(got(1L) == ((3, true)))
    assert(got(2L) == ((2, false)), "out-of-order purchase must not count")
    assert(got(3L) == ((2, false)), "purchase past the window must not count")
    assert(got(4L) == ((0, false)), "no stage-1 event → level 0")
    assert(got(5L) == ((1, false)), "greedy chain anchors at the EARLIEST view")
  }

  test("last-touch attribution: window cutoff, exact-tie visibility, direct fallback") {
    import graft.ops.Funnel
    val ev = Seq(
      // conv 100: click at 10:30 beats view at 10:00 (later wins)
      (1L, "view", "2024-01-01 10:00:00", 1L), (1L, "click", "2024-01-01 10:30:00", 2L),
      (1L, "purchase", "2024-01-01 11:00:00", 100L),
      // conv 101: only touch is outside the 1 h window → direct
      (2L, "view", "2024-01-01 08:00:00", 3L),
      (2L, "purchase", "2024-01-01 10:00:00", 101L),
      // conv 102: touch at the exact conversion timestamp IS visible
      (3L, "click", "2024-01-01 12:00:00", 4L),
      (3L, "purchase", "2024-01-01 12:00:00", 102L),
      // conv 103: no touches at all → direct
      (4L, "purchase", "2024-01-01 09:00:00", 103L),
      // conv 104: equal-ts touches break toward the greater type (view)
      (5L, "view", "2024-01-01 10:00:00", 5L), (5L, "click", "2024-01-01 10:00:00", 6L),
      (5L, "purchase", "2024-01-01 10:10:00", 104L)
    ).map { case (u, t, s, id) => (u, t, ts(s), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.lastTouchAttribution(ev, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("view", "click"), windowSec = 3600L)
      .select("event_id", "touch_type").as[(Long, String)].collect().toMap
    assert(got(100L) == "click")
    assert(got(101L) == "direct", "out-of-window touch must not attribute")
    assert(got(102L) == "click", "exact-tie touch is visible to the conversion")
    assert(got(103L) == "direct")
    assert(got(104L) == "view", "equal-ts touches break toward the greater type")
  }

  test("cohort retention: offsets anchor at the signup week; pre-signup weeks drop") {
    import graft.ops.Funnel
    val ev = Seq(
      // u1 signs up in the epoch week starting Thu 2024-01-04 (epoch
      // weeks run Thu–Wed); active again at offsets 1 (Jan 12) and 3
      // (Jan 25, week of Jan 25–31)
      (1L, "signup", "2024-01-04 10:00:00"), (1L, "view", "2024-01-12 10:00:00"),
      (1L, "view", "2024-01-25 10:00:00"),
      // u2 same cohort, active week 0 only; a PRE-signup event is dropped
      (2L, "view", "2024-01-01 10:00:00"), (2L, "signup", "2024-01-05 10:00:00"),
      // u3 never signs up → excluded entirely
      (3L, "view", "2024-01-04 10:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val got = Funnel.cohortRetention(ev, "user_id", "ts", "event_type", "signup")
      .select("week_offset", "n_users").as[(Long, Long)].collect().toMap
    assert(got(0L) == 2L, s"both cohort members active in week 0: $got")
    assert(got(1L) == 1L && got(3L) == 1L, s"u1 retains at offsets 1 and 3: $got")
    assert(!got.contains(-1L), "pre-signup activity must not appear")
  }
}
