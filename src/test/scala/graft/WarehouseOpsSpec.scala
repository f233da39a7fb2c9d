package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Changelog, DataQuality, Stats, TsAnalytics}

/** Round-8 batch: CDC apply / SCD2 history, time-series diagnostics, and
  * data-quality audits (SURVEY §2.12 L182–L193).
  */
class WarehouseOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Changelog -------------------------------------------------------

  test("cdcApply: latest-wins upsert, delete wins over snapshot, new key inserts") {
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val ch = Seq(
      (1L, 100L, 1L, "U", 11.0),  // stale update...
      (1L, 200L, 2L, "U", 12.0),  // ...latest wins
      (2L, 100L, 1L, "D", 0.0),   // delete key 2
      (4L, 100L, 1L, "U", 44.0),  // brand-new key
      (5L, 100L, 1L, "D", 0.0)    // delete of a key never in the snapshot
    ).toDF("k", "seq", "tie", "op", "v")
    val got = Changelog.cdcApply(snap, ch, "k", "seq", "tie", "op", "v")
      .as[(Long, Double, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(
      1L -> ((12.0, "changelog")),
      3L -> ((30.0, "snapshot")),
      4L -> ((44.0, "changelog"))), got.toString)
  }

  test("cdcApply: equal seq broken by the tie column, descending") {
    val snap = Seq((1L, 0.0)).toDF("k", "v")
    val ch = Seq((1L, 100L, 1L, "U", 1.0), (1L, 100L, 2L, "U", 2.0))
      .toDF("k", "seq", "tie", "op", "v")
    val got = Changelog.cdcApply(snap, ch, "k", "seq", "tie", "op", "v")
      .select("v").as[Double].collect().toSeq
    assert(got == Seq(2.0), got.toString)
  }

  test("scd2History: consecutive duplicates collapse; intervals chain half-open; last is current") {
    val ch = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), // dup collapses
      (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"), // a again = NEW interval
      (2L, 10L, 5L, "x"))
      .toDF("k", "seq", "tie", "attr")
    val got = Changelog.scd2History(ch, "k", "seq", "tie", "attr")
      .select("k", "attr", "from_us", "to_us", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "x", 10L, None, true)), got.toString)
  }

  test("scd2History: same-seq ties collapse to the last by tie (no zero-width interval)") {
    val ch = Seq(
      (1L, 10000L, 1L, "a"),
      (1L, 20000L, 2L, "b"), (1L, 20000L, 3L, "c"), // same seq: c survives
      (2L, 10000L, 4L, "x"), (2L, 10000L, 5L, "x")) // same seq, same attr
      .toDF("k", "seq", "tie", "attr")
    val got = Changelog.scd2History(ch, "k", "seq", "tie", "attr")
      .select("k", "attr", "from_us", "to_us", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "a", 10000L, Some(20000L), false),
      (1L, "c", 20000L, None, true),
      (2L, "x", 10000L, None, true)), got.toString)
    // And the point-in-time lookup at the tied boundary is deterministic:
    // the surviving (last-tie) attribute wins.
    val facts = Seq((1L, ts(20000L), 100L)).toDF("k", "t", "fid")
    val hist = Changelog.scd2History(ch, "k", "seq", "tie", "attr")
    val look = Changelog.dimensionLookup(facts, hist, "k", "t", "fid", "attr")
      .select("fid", "attr").as[(Long, Option[String])].collect().toMap
    assert(look == Map(100L -> Some("c")), look.toString)
  }

  test("dimensionLookup: two intervals sharing (key, from_us) resolve last-by-tie") {
    // An externally-assembled history (union of two builds) CAN carry two
    // intervals at the same (key, from_us) — scd2History itself never
    // emits that, so this pins dimensionLookup's own tie rule: with
    // tieCol passed, the LAST tie wins (same rule as the history build's
    // same-seq collapse), deterministically, for boundary facts AND
    // later facts.
    val hist = Seq(
      (1L, "old", 10000L, Some(20000L), false, 1L),
      (1L, "b", 20000L, None, true, 2L), // same from_us, tie 2
      (1L, "c", 20000L, None, true, 3L)) // same from_us, tie 3 → wins
      .toDF("k", "attr", "from_us", "to_us", "is_current", "tie")
    val facts = Seq((1L, ts(20000L), 100L), (1L, ts(30000L), 101L))
      .toDF("k", "t", "fid")
    val look = Changelog.dimensionLookup(facts, hist, "k", "t", "fid",
        "attr", tieCol = Some("tie"))
      .select("fid", "attr").as[(Long, Option[String])].collect().toMap
    assert(look == Map(100L -> Some("c"), 101L -> Some("c")), look.toString)
  }

  test("scd2History carries the surviving tie value through to its output") {
    val ch = Seq(
      (1L, 20000L, 2L, "b"), (1L, 20000L, 3L, "c")) // same seq: tie 3 survives
      .toDF("k", "seq", "tie", "attr")
    val got = Changelog.scd2History(ch, "k", "seq", "tie", "attr")
      .select("k", "attr", "from_us", "tie")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "c", 20000L, 3L)), got.toString)
  }

  // ---- TsAnalytics -----------------------------------------------------

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("timeWeightedAvg: holding-time weights, last sample drops out") {
    // user 1: v=10 held 10 s, v=20 held 30 s, v=99 unweighted (last)
    val df = Seq(
      (1L, ts(0L), 1L, 10.0),
      (1L, ts(10000000L), 2L, 20.0),
      (1L, ts(40000000L), 3L, 99.0))
      .toDF("u", "t", "id", "v")
    val got = TsAnalytics.timeWeightedAvg(df, "u", "t", "v", "id")
      .as[(Long, Double, Double, Long)].collect().head
    // (10*10 + 20*30) / 40 = 17.5
    assert(got == ((1L, 17.5, 40.0, 2L)), got.toString)
  }

  test("rollingAutocorr: constant-increment series has autocorr 1; warm-up rows dropped") {
    val rows = (0 until 10).map(i => (1L, ts(i * 1000000L), i.toLong, i.toDouble))
    val got = TsAnalytics.rollingAutocorr(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id", frameRows = 4)
      .select("autocorr").as[Option[Double]].collect()
    // 10 rows, frame 4 ⇒ rows 0-2 warm up; frames start at the row with
    // a full 4-lag-pair window. Perfectly linear series ⇒ corr 1.
    assert(got.length == 6, got.mkString(","))
    assert(got.forall(_.contains(1.0)), got.mkString(","))
  }

  test("rollingAutocorr: alternating series has autocorr -1") {
    val rows = (0 until 8).map(i =>
      (1L, ts(i * 1000000L), i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val got = TsAnalytics.rollingAutocorr(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id", frameRows = 4)
      .select("autocorr").as[Option[Double]].collect()
    assert(got.nonEmpty && got.forall(_.contains(-1.0)), got.mkString(","))
  }

  test("acf: alternating series has acf(1) = -1, acf(2) = +1; constant series null") {
    val rows = (0 until 12).map(i =>
      (1L, ts(i * 1000000L), i.toLong, if (i % 2 == 0) 1.0 else -1.0)) ++
      (0 until 6).map(i => (2L, ts(i * 1000000L), (100 + i).toLong, 7.0))
    val got = TsAnalytics.acf(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id", maxLag = 2)
      .as[(Long, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((1L, 1)) == ((11L, Some(-1.0))), got.toString)
    assert(got((1L, 2)) == ((10L, Some(1.0))), got.toString)
    assert(got((2L, 1))._2.isEmpty, "constant series has no defined ACF")
  }

  test("cusumChangepoint: locates the level shift") {
    // 5 points at 0, then 5 at 10: |cusum| peaks at the last pre-shift row.
    val rows = (0 until 10).map(i =>
      (1L, ts(i * 1000000L), i.toLong, if (i < 5) 0.0 else 10.0))
    val got = TsAnalytics.cusumChangepoint(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._2 == 10L)
    assert(got._3 == 4000000L, s"changepoint at the 5th row, got ${got._3}")
    assert(got._4 == 25.0, got.toString) // 5 * |0 - 5|
  }

  test("seasonalNaiveEval: lag-season forecast scores only matchable buckets") {
    // Hours 0..3 then hours 24..27 (season 24): forecasts exist only for
    // the second day; |y - yhat| = 1 for each of the 4 pairs.
    val rows = (0 until 4).flatMap { h =>
      Seq((1L, ts(h * 3600000000L), h.toLong, 10.0 + h),
        (1L, ts((h + 24) * 3600000000L), (h + 24).toLong, 11.0 + h))
    }
    val got = TsAnalytics.seasonalNaiveEval(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id", seasonHours = 24)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 4L, 1000000L)), got.toString) // MAE 1.0 in µ-units
  }

  test("completenessReport: expected from span, missing = expected - present") {
    // Hours 0, 1, 3 present (2 absent): expected 4, present 3.
    val rows = Seq(0, 1, 3).map(h => (1L, ts(h * 3600000000L), h.toDouble))
    val got = TsAnalytics.completenessReport(rows.toDF("u", "t", "v"), "u", "t")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((1L, 4L, 3L, 1L, 0.75)), got.toString)
  }

  // ---- DataQuality -----------------------------------------------------

  test("referentialIntegrity: counts orphans incl. null fks; clean relation reads 0") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = DataQuality.referentialIntegrity(Seq(
        DataQuality.Relation("child->parent", child, "fk", parent, "pk"),
        DataQuality.Relation("parent->parent", parent, "pk", parent, "pk")))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("child->parent") == ((4L, 2L)), got.toString)
    assert(got("parent->parent") == ((3L, 0L)), got.toString)
  }

  test("benfordDigits: digit extraction from cent representation, shares sum to 1") {
    val df = Seq(1.00, 19.99, 250.0, 2.50, 999.99, 0.0, -5.0).toDF("v")
    val got = DataQuality.benfordDigits(df, "v")
      .select("digit", "n", "share").as[(Int, Long, Double)].collect()
    val byDigit = got.map(r => r._1 -> r._2).toMap
    // 0 and negative excluded; digits: 1.00→1, 19.99→1, 250.0→2, 2.50→2,
    // 999.99→9 — and the 1..9 spine reports every absent digit as n = 0.
    assert(byDigit == Map(1 -> 2L, 2 -> 2L, 3 -> 0L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), byDigit.toString)
    assert(got.length == 9, "nine rows by construction")
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9)
  }

  test("mutualInfo: zero for independent columns, ln 2 for a perfect copy") {
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("l", "s")
    val gotDep = Stats.mutualInfo(dep, "l", "s")
      .select("n_cells", "n_rows", "mutual_info_nats")
      .as[(Long, Long, Double)].collect().head
    assert(gotDep._1 == 2L && gotDep._2 == 4L)
    assert(math.abs(gotDep._3 - math.log(2.0)) < 1e-5, gotDep.toString)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("l", "s")
    val gotInd = Stats.mutualInfo(ind, "l", "s")
      .select("mutual_info_nats").as[Double].collect().head
    assert(math.abs(gotInd) < 1e-9, gotInd.toString)
  }

  test("chiSquareIndependence: zero cells counted via the algebraic fold") {
    // 2×2 with two EMPTY cells: direct χ² over all four cells is 4
    // ((2−1)² + (0−1)² + (0−1)² + (2−1)², each e = 1); an observed-only
    // sum would read 0 + 4 = ... the + N term restores the absent cells.
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("l", "s")
    val got = Stats.chiSquareIndependence(dep, "l", "s")
      .select("chi2", "dof").as[(Double, Long)].collect().head
    assert(math.abs(got._1 - 4.0) < 1e-9 && got._2 == 1L, got.toString)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("l", "s")
    val gotInd = Stats.chiSquareIndependence(ind, "l", "s")
      .select("chi2").as[Double].collect().head
    assert(math.abs(gotInd) < 1e-9, gotInd.toString)
  }

  test("exactPercentiles: nearest-rank values, duplicates and p=1.0 handled") {
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = Stats.exactPercentiles(df, "v", Seq(0.5, 0.9, 1.0))
      .select("percentile", "value").as[(Double, Double)].collect().toMap
    assert(got == Map(0.5 -> 5.0, 0.9 -> 9.0, 1.0 -> 10.0), got.toString)
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 3.0).toDF("v")
    val gotDup = Stats.exactPercentiles(dup, "v", Seq(0.5))
      .select("value").as[Double].collect().head
    assert(gotDup == 2.0, gotDup.toString)
  }

  test("holtSmoothing: hand-folded level/trend; single-sample users omitted") {
    // y = (10, 12, 13), α = β = 0.5: l₁=10 b₁=2 → l₂=12 b₂=2 →
    // l₃=13.5 b₃=1.75, forecast 15.25.
    val df = Seq((1L, ts(1000000L), 1L, 10.0), (1L, ts(2000000L), 2L, 12.0),
      (1L, ts(3000000L), 3L, 13.0), (2L, ts(1000000L), 4L, 7.0))
      .toDF("u", "t", "id", "v")
    val got = graft.ops.TsAnalytics.holtSmoothing(df, "u", "t", "v", "id",
        alpha = 0.5, beta = 0.5)
      .select("u", "n", "level", "trend", "forecast_next")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 3L, 13.5, 1.75, 15.25)), got.mkString(","))
  }

  test("pmiCollocations: exact PMI on a controlled corpus; floor cuts rare pairs") {
    // 5 × "new york", 5 × "old town", 1 × "rare pair" (below the floor).
    val docs = ((1 to 5).map(i => (i.toLong, "new york")) ++
      (6 to 10).map(i => (i.toLong, "old town")) ++
      Seq((11L, "rare pair"))).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.pmiCollocations(docs, "doc_id", "text",
        minCount = 5)
      .select("w1", "w2", "n_pair", "pmi")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // NB = 11 bigrams, NU = 22 tokens; PMI = ln(5·22²/(11·5·5)) = ln 8.8.
    assert(got.keySet == Set(("new", "york"), ("old", "town")), got.toString)
    assert(math.abs(got(("new", "york"))._2 - math.log(8.8)) < 1e-3,
      got.toString)
    assert(got(("new", "york"))._1 == 5L)
  }

  test("rendezvousAssign: deterministic, in range; growth moves keys ONLY to the new shard") {
    val keys = (1L to 1000L).toDF("k")
    val a1 = graft.ops.Routing.rendezvousAssign(keys, "k", 8)
      .as[(Long, Int)].collect().toMap
    val a2 = graft.ops.Routing.rendezvousAssign(keys, "k", 8)
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2, "assignment must be deterministic")
    assert(a1.values.forall(s => s >= 0 && s < 8))
    assert(a1.values.toSet.size == 8, "1000 keys should touch all 8 shards")
    // The rendezvous property: growing 8 → 9 moves a key ONLY if the
    // new shard's digest wins, i.e. every moved key lands on shard 8.
    val rep = graft.ops.Routing.reshardReport(keys, "k", 8, 9)
      .as[(Int, Int, Long)].collect()
    val moved = rep.filter(r => r._1 != r._2)
    assert(moved.forall(_._2 == 8), rep.mkString(","))
    val movedN = moved.map(_._3).sum
    assert(movedN > 0 && movedN < 1000 / 4,
      s"~1/9 of keys should move, got $movedN")
  }

  test("intervalUnion: overlaps merge, touching intervals chain, disjoint stay apart") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L),   // overlap → [0,12)
      (1L, 12L, 20L),                 // touches (s == prior max e) → merges
      (1L, 30L, 40L),                 // disjoint
      (2L, 0L, 100L), (2L, 10L, 20L)) // fully contained
      .toDF("u", "s", "e")
    val got = graft.ops.TsAnalytics.intervalUnion(iv, "u", "s", "e")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((2L, 30L)), 2L -> ((1L, 100L))), got.toString)
  }

  test("dropoffSummary: spine zeros, suffix reach counts, step conversion") {
    val funnel = Seq(0, 1, 1, 3, 3, 3).toDF("funnel_level") // nobody at 2
    val got = graft.ops.Funnel.dropoffSummary(funnel, nStages = 3)
      .as[(Int, Long, Long, Option[Double])].collect().sortBy(_._1)
    // reached: lvl0=6, lvl1=5, lvl2=3, lvl3=3.
    assert(got.toSeq == Seq(
      (0, 1L, 6L, None),
      (1, 2L, 5L, Some(0.833333)),
      (2, 0L, 3L, Some(0.6)),
      (3, 3L, 3L, Some(1.0))), got.mkString(","))
  }

  test("quantileNormalize: groups map onto the global marginal; singleton → median") {
    // group a = (1, 2, 3), group b = (10, 20, 30), singleton c = (99).
    // Global sorted: 1,2,3,10,20,30,99 (N=7). For n_g=3: ranks 1,2,3 →
    // global ranks 1, 4, 7 → values 1, 10, 99 for BOTH groups.
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L),
      ("b", 10.0, 4L), ("b", 20.0, 5L), ("b", 30.0, 6L), ("c", 99.0, 7L))
      .toDF("g", "v", "id")
    val got = graft.ops.Stats.quantileNormalize(df, "g", "v", "id")
      .select("id", "normalized").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 10.0, 3L -> 99.0,
      4L -> 1.0, 5L -> 10.0, 6L -> 99.0,
      7L -> 10.0), got.toString) // singleton → (7+1) div 2 = rank 4 → 10
  }

  test("ksDrift: identical marginals give 0; disjoint supports give ~1") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val gotSame = graft.ops.Stats.ksDrift(same, "g", "v")
      .select("ks").as[Option[Double]].collect().flatten
    assert(gotSame.forall(_ == 0.0), gotSame.mkString(","))
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0))
      .toDF("g", "v")
    val gotDisj = graft.ops.Stats.ksDrift(disj, "g", "v")
      .select("ks").as[Option[Double]].collect().flatten
    assert(gotDisj.forall(_ == 1.0), gotDisj.mkString(","))
  }

  test("aucRoc: perfect separation 1, reversal 0, all-ties 0.5 via midranks") {
    val perfect = Seq((1.0, true), (2.0, true), (0.1, false), (0.2, false))
      .toDF("s", "y")
    def auc(df: org.apache.spark.sql.DataFrame): Double =
      graft.ops.Stats.aucRoc(df, col("y"), "s")
        .select("auc").as[Option[Double]].collect().head.get
    assert(auc(perfect) == 1.0)
    val reversed = Seq((1.0, false), (2.0, false), (0.1, true), (0.2, true))
      .toDF("s", "y")
    assert(auc(reversed) == 0.0)
    val ties = Seq((5.0, true), (5.0, true), (5.0, false), (5.0, false))
      .toDF("s", "y")
    assert(auc(ties) == 0.5, "all-tied scores must midrank to 0.5")
    // Hand case: pos scores (3, 1), neg (2): pairs (3>2)=1, (1<2)=0 → 0.5.
    val hand = Seq((3.0, true), (1.0, true), (2.0, false)).toDF("s", "y")
    assert(auc(hand) == 0.5, auc(hand).toString)
  }

  test("neymanSample: zero-variance stratum draws nothing; allocation tracks N·S") {
    // Stratum a: constant values (S = 0) → weight 0 → quota 0.
    // Stratum b: spread values take the whole budget, capped at |b|.
    val df = ((1 to 10).map(i => (i.toLong, "a", 50L)) ++
      (11 to 20).map(i => (i.toLong, "b", (i % 5) * 100L)))
      .toDF("id", "st", "x")
    val got = graft.ops.Sampling.neymanSample(df, "id", "st", "x", totalN = 6)
      .select("st").as[String].collect()
    assert(got.forall(_ == "b") && got.length == 6, got.mkString(","))
    // Budget larger than the only eligible stratum: capped at its size.
    val capped = graft.ops.Sampling.neymanSample(df, "id", "st", "x",
      totalN = 100).select("st").as[String].collect()
    assert(capped.length == 10 && capped.forall(_ == "b"),
      capped.mkString(","))
    // Determinism: same call, same rows.
    val again = graft.ops.Sampling.neymanSample(df, "id", "st", "x",
      totalN = 6).select("id").as[Long].collect().sorted
    val first = graft.ops.Sampling.neymanSample(df, "id", "st", "x",
      totalN = 6).select("id").as[Long].collect().sorted
    assert(again.toSeq == first.toSeq)
  }

  test("stlDecompose: components reassemble; constant series has flat trend, zero rest") {
    def hts(h: Long) = ts(h * 3600000000L)
    val const = (0 until 30).map(h => (1L, hts(h.toLong), 4.0))
      .toDF("u", "t", "v")
    val gotC = graft.ops.TsAnalytics.stlDecompose(const, "u", "t", "v")
      .select("value", "trend", "seasonal", "residual")
      .as[(Double, Double, Double, Double)].collect()
    assert(gotC.forall(r => r._1 == 4.0 && r._2 == 4.0 && r._3 == 0.0 &&
      r._4 == 0.0), gotC.take(3).mkString(","))
    // Varied series: decomposition must reassemble to the value.
    val varied = (0 until 72).map(h =>
      (1L, hts(h.toLong), 10.0 + (h % 24) + 0.37 * h)).toDF("u", "t", "v")
    val gotV = graft.ops.TsAnalytics.stlDecompose(varied, "u", "t", "v")
      .select("value", "trend", "seasonal", "residual")
      .as[(Double, Double, Double, Double)].collect()
    assert(gotV.forall(r => math.abs(r._1 - (r._2 + r._3 + r._4)) < 1e-9),
      gotV.take(3).mkString(","))
  }

  test("markovStationary: biased two-state chain matches the hand recurrence") {
    // Sequence A A A A B A → P(A→A)=.75, P(A→B)=.25, P(B→A)=1.
    // From (0.5, 0.5): π₁=(.875,.125), π₂=(.78125,.21875),
    // π₃=(.8046875,.1953125).
    val ev = Seq("A", "A", "A", "A", "B", "A").zipWithIndex.map {
      case (st, i) => (1L, ts(i * 1000000L), i.toLong, st)
    }.toDF("u", "t", "id", "s")
    val got = graft.ops.Stats.markovStationary(ev, "u", "t", "id", "s",
        iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("A") - 0.804688) < 1e-6, got.toString)
    assert(math.abs(got("B") - 0.195313) < 1e-6, got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-4, got.toString)
  }

  test("bootstrapMeanCi: constant series collapses the interval; CI brackets the mean") {
    val const = (1 to 200).map(i => (i.toLong, 7.5)).toDF("id", "v")
    val gotC = graft.ops.Stats.bootstrapMeanCi(const, "id", "v",
        replicas = 16)
      .select("n", "mean", "ci_lo", "ci_hi", "n_replicas")
      .as[(Long, Double, Double, Double, Long)].collect().head
    assert(gotC == ((200L, 7.5, 7.5, 7.5, 16L)), gotC.toString)
    val spread = (1 to 500).map(i => (i.toLong, (i % 10).toDouble))
      .toDF("id", "v")
    val gotS = graft.ops.Stats.bootstrapMeanCi(spread, "id", "v",
        replicas = 32)
      .select("mean", "ci_lo", "ci_hi")
      .as[(Double, Double, Double)].collect().head
    assert(gotS._2 <= gotS._1 && gotS._1 <= gotS._3, gotS.toString)
    assert(gotS._3 - gotS._2 < 1.0, s"CI implausibly wide: $gotS")
  }

  test("rakeKeyphrases: deg/freq scoring on a hand corpus; floor cuts rare phrases") {
    // 3 × "good data pipeline" + 1 × "the good data": stopword 'the'
    // opens an island, so candidates are the 3-run (×3) and the 2-run
    // (×1, below the floor). Word stats over ALL candidates:
    // good/data freq 4 deg 11, pipeline freq 3 deg 9 →
    // score = 11/4 + 11/4 + 9/3 = 8.5.
    val docs = ((1 to 3).map(i => (i.toLong, "good data pipeline")) ++
      Seq((4L, "the good data"))).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.rakeKeyphrases(docs, "doc_id", "text",
        maxLen = 4, minPhraseCount = 3)
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == Seq(("good data pipeline", 3L, 8.5)),
      got.mkString(","))
  }

  test("cohortLtv: cumulative cents per cohort, per-user LTV, separate cohorts") {
    def wts(w: Long) = ts(w * 604800000000L)
    val ev = Seq(
      (1L, wts(0), 1L, "signup", 10.0), (1L, wts(1), 2L, "click", 20.0),
      (2L, wts(0), 3L, "signup", 5.0),
      (3L, wts(5), 4L, "signup", 1.0))
      .toDF("u", "t", "id", "ty", "v")
    val got = graft.ops.Funnel.cohortLtv(ev, "u", "t", "ty", "signup", "v")
      .select("cohort_week", "week_offset", "n_active_users",
        "cohort_size", "cum_revenue", "ltv_per_user")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 2L, 15.0, 7.5),
      (0L, 1L, 1L, 2L, 35.0, 17.5),
      (5L, 0L, 1L, 1L, 1.0, 1.0)), got.toString)
  }

  test("stlAnomalies: a spike against daily shape flags; its own hour alone") {
    def hts(h: Long) = ts(h * 3600000000L)
    // 72 hours of trend+daily shape, one massive spike at hour 50.
    val rows = (0 until 72).map { h =>
      val base = 10.0 + (h % 24) + 0.1 * h
      (1L, hts(h.toLong), if (h == 50) base + 1000.0 else base)
    }.toDF("u", "t", "v")
    val got = graft.ops.TsAnalytics.stlAnomalies(rows, "u", "t", "v",
        nSigma = 3.0)
      .select("hour_bucket").as[Long].collect().toSet
    assert(got.contains(50L), s"spike hour must flag: $got")
    assert(got.size <= 5, s"flag set must stay tight: $got")
  }

  test("welchTTest: hand-computed t and Welch dof; degenerate groups null") {
    // a = {1,2,3} (m=2, v=1), b = {2,4,6,8} (m=5, v≈6.6667):
    // se² = 1/3 + 20/3·(1/4)… exact: v_b = 20/3; se² = 1/3 + 5/3 = 2;
    // t = (2−5)/√2 = −2.1213; dof = 4/((1/3)²/2 + (5/3)²/3) ≈ 4.0755
    // → 4.08 at 2 dp.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val got = Stats.welchTTest(df, "g", "v", "a", "b")
      .select("n_a", "n_b", "mean_a", "mean_b", "t_stat", "dof")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got._1 == 3L && got._2 == 4L)
    assert(got._3 == 2.0 && got._4 == 5.0)
    assert(got._5 == -2.1213, got.toString)
    assert(math.abs(got._6 - 4.08) < 1e-9, got.toString)
    // Single-row group → t and dof null.
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.welchTTest(tiny, "g", "v", "a", "b").collect().head
    assert(r.isNullAt(r.fieldIndex("t_stat")) && r.isNullAt(r.fieldIndex("dof")))
    // Zero variance on both sides → null, not a 0-divide.
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val rc = Stats.welchTTest(const, "g", "v", "a", "b").collect().head
    assert(rc.isNullAt(rc.fieldIndex("t_stat")))
  }

  test("corpusDiff classifies added/removed/changed/unchanged with char deltas") {
    val oldV = Seq(
      (1L, "alpha", "s1"),   // unchanged
      (2L, "beta", "s1"),    // changed (+4 chars)
      (3L, "gamma", "s2")    // removed
    ).toDF("doc_id", "text", "source")
    val newV = Seq(
      (1L, "alpha", "s1"),
      (2L, "beta new", "s1"),
      (4L, "delta", "s2")    // added
    ).toDF("doc_id", "text", "source")
    val got = DataQuality.corpusDiff(oldV, newV, "doc_id", "text", "source")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("s1", "unchanged", 1L, 0L),
      ("s1", "changed", 1L, 4L),
      ("s2", "removed", 1L, -5L),
      ("s2", "added", 1L, 5L)), got.toString)
  }

  test("corpusDiff: a changed doc reports the NEW version's group") {
    val oldV = Seq((1L, "t", "gOld")).toDF("doc_id", "text", "source")
    val newV = Seq((1L, "t2", "gNew")).toDF("doc_id", "text", "source")
    val got = DataQuality.corpusDiff(oldV, newV, "doc_id", "text", "source")
      .select("source", "status").as[(String, String)].collect().toSeq
    assert(got == Seq(("gNew", "changed")))
  }

  test("freshnessReport: frontier lag in whole hours; stale flag at the cutoff") {
    def hts(h: Long) = ts(h * 3600000000L)
    val df = Seq(
      ("a", hts(100)), ("a", hts(90)),  // frontier group, lag 0
      ("b", hts(76)),                   // lag 24 → stale at 24h cutoff
      ("c", hts(99))                    // lag 1
    ).toDF("g", "t")
    val got = graft.ops.DataQuality.freshnessReport(df, "g", "t",
        staleAfterHours = 24)
      .select("g", "n_rows", "lag_hours", "stale")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("a" -> ((2L, 0L, false)), "b" -> ((1L, 24L, true)),
      "c" -> ((1L, 1L, false))), got.toString)
  }

  test("activeUsers: DAU counts distinct per day; WAU is the exact trailing-7 union") {
    def dts(d: Long) = ts(d * 86400000000L)
    // user 1 on days 0 and 3; user 2 on day 3 (twice); user 3 on day 10.
    val df = Seq((1L, dts(0)), (1L, dts(3)), (2L, dts(3)), (2L, dts(3)),
      (3L, dts(10))).toDF("u", "t")
    val got = graft.ops.TsAnalytics.activeUsers(df, "u", "t")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // day 0: dau 1 (u1), wau 1; day 3: dau 2 (u1,u2), wau 2 (u1 counted
    // once though active on 0 AND 3 — both inside [−3, 3]); day 10:
    // dau 1, wau 1 (days 0/3 fell out of the window).
    assert(got == Map(0L -> ((1L, 1L)), 3L -> ((2L, 2L)),
      10L -> ((1L, 1L))), got.toString)
  }

  test("nullProfile: per-column rows, null counts, distinct cardinality") {
    val df = Seq((Some(1), Some("a")), (None, Some("a")), (Some(2), None))
      .toDF("x", "y")
    val got = graft.ops.DataQuality.nullProfile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("x" -> ((3L, 1L, 2L)), "y" -> ((3L, 1L, 1L))),
      got.toString)
  }

  test("wilsonShare: interval brackets the share and stays inside [0,1]") {
    val df = (1 to 10).map(i => ("s", i <= 9)).toDF("g", "ok")
    val got = DataQuality.wilsonShare(df, "g", col("ok"))
      .select("n", "successes", "share", "wilson_lo", "wilson_hi")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 10L && got._2 == 9L && got._3 == 0.9)
    // Wilson at p=.9, n=10, z=1.96: ≈ [0.596, 0.982]
    assert(got._4 > 0.55 && got._4 < got._3, got.toString)
    assert(got._5 > got._3 && got._5 < 1.0, got.toString)
  }

  test("ewma: seeded with first sample, folds in time order") {
    // alpha 0.5 over values 1, 2, 3: 1 → 1.5 → 2.25
    val rows = Seq((1L, ts(1000000L), 1L, 1.0), (1L, ts(2000000L), 2L, 2.0),
      (1L, ts(3000000L), 3L, 3.0), (2L, ts(1000000L), 4L, 7.0))
    val got = TsAnalytics.ewma(rows.toDF("u", "t", "id", "v"),
        "u", "t", "v", "id", alpha = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((3L, 2.25)), 2L -> ((1L, 7.0))), got.toString)
  }

  test("dimensionLookup: fact reads the interval valid at its ts; pre-history facts null") {
    val hist = Changelog.scd2History(Seq(
        (1L, 100000L, 1L, "bronze"), (1L, 200000L, 2L, "gold"))
        .toDF("k", "seq", "tie", "attr"),
      "k", "seq", "tie", "attr")
    val facts = Seq((1L, ts(50000L), 10L), (1L, ts(100000L), 11L),
      (1L, ts(150000L), 12L), (1L, ts(250000L), 13L))
      .toDF("k", "t", "fid")
    val got = Changelog.dimensionLookup(facts, hist, "k", "t", "fid", "attr")
      .select("fid", "attr").as[(Long, Option[String])].collect().toMap
    assert(got == Map(10L -> None, 11L -> Some("bronze"),
      12L -> Some("bronze"), 13L -> Some("gold")), got.toString)
  }

  test("positionBasedAttribution: 40/20/40 split, single-touch full credit, direct fallback") {
    val ev = Seq(
      // user 1: 4 touches then purchase → 0.4, 0.1, 0.1, 0.4
      (1L, ts(1000000L), 1L, "view"), (1L, ts(2000000L), 2L, "click"),
      (1L, ts(3000000L), 3L, "view"), (1L, ts(4000000L), 4L, "click"),
      (1L, ts(5000000L), 5L, "purchase"),
      // user 2: one touch → 1.0
      (2L, ts(1000000L), 6L, "view"), (2L, ts(2000000L), 7L, "purchase"),
      // user 3: no touch → direct
      (3L, ts(1000000L), 8L, "purchase"),
      // user 4: exactly two touches → middle weight folds onto the
      // endpoints: 0.5/0.5, summing to 1 (the n=2 gap ADVICE flagged)
      (4L, ts(1000000L), 9L, "view"), (4L, ts(2000000L), 10L, "click"),
      (4L, ts(3000000L), 11L, "purchase"))
      .toDF("u", "t", "id", "ty")
    val got = graft.ops.Funnel.positionBasedAttribution(ev, "u", "t", "ty",
        "id", "purchase", Seq("view", "click"), windowSec = 3600L)
      .select("conv_id", "touch_id", "touch_type", "credit")
      .as[(Long, Option[Long], String, Double)].collect()
    val u1 = got.filter(_._1 == 5L).sortBy(_._2)
    assert(u1.map(_._4).toSeq == Seq(0.4, 0.1, 0.1, 0.4), u1.mkString(","))
    assert(math.abs(u1.map(_._4).sum - 1.0) < 1e-9)
    assert(got.filter(_._1 == 7L).toSeq ==
      Seq((7L, Some(6L), "view", 1.0)), got.mkString(","))
    assert(got.filter(_._1 == 8L).toSeq ==
      Seq((8L, None, "direct", 1.0)), got.mkString(","))
    val u4 = got.filter(_._1 == 11L).sortBy(_._2)
    assert(u4.map(_._4).toSeq == Seq(0.5, 0.5), u4.mkString(","))
    assert(math.abs(u4.map(_._4).sum - 1.0) < 1e-9,
      "two-touch credits must sum to 1")
  }

  test("positionBasedAttribution: touches outside the window are excluded") {
    val ev = Seq(
      (1L, ts(0L), 1L, "view"),              // 10 s before, window 5 s
      (1L, ts(8000000L), 2L, "click"),       // inside
      (1L, ts(10000000L), 3L, "purchase"))
      .toDF("u", "t", "id", "ty")
    val got = graft.ops.Funnel.positionBasedAttribution(ev, "u", "t", "ty",
        "id", "purchase", Seq("view", "click"), windowSec = 5L)
      .select("touch_id", "credit").as[(Option[Long], Double)].collect()
    assert(got.toSeq == Seq((Some(2L), 1.0)), got.mkString(","))
  }

  test("incrementalJoin: base ∪ delta⋈dim equals the direct join") {
    val facts = Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 10L, 3.0),
      (4L, 20L, 4.0)).toDF("fid", "k", "v")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("k", "attr")
    val base = facts.filter(col("fid") <= 2).join(dim, Seq("k"))
    val delta = facts.filter(col("fid") > 2)
    val inc = Changelog.incrementalJoin(base, delta, dim, Seq("k"))
      .select("fid", "k", "attr").as[(Long, Long, String)].collect().toSet
    val direct = facts.join(dim, Seq("k"))
      .select("fid", "k", "attr").as[(Long, Long, String)].collect().toSet
    assert(inc == direct && inc.size == 4, inc.toString)
  }

  test("entityMatch: block prunes candidates; best match by (distance, id)") {
    val left = Seq((1L, "abc-001"), (2L, "zzz-999")).toDF("lid", "lname")
    val right = Seq((10L, "abd-001"), (11L, "abc-001"), (12L, "qqq-002"))
      .toDF("rid", "rname")
    val got = DataQuality.entityMatch(left, "lid", "lname",
        right, "rid", "rname",
        blockOf = n => substring(n, 5, 3), maxDist = 2)
      .select("lid", "rid", "distance").as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // lid 1 blocks with 10 and 11 (suffix 001): exact match 11 wins at 0.
    // lid 2 (suffix 999) has no block partner → absent.
    assert(got == Map(1L -> ((11L, 0))), got.toString)
  }

  test("twoProportionZTest: known counts give the textbook z; degenerate pool yields null") {
    // A: 10 users, 8 convert; B: 10 users, 2 convert.
    val rows = (1 to 20).map { u =>
      val a = u <= 10
      val conv = if (a) u <= 8 else u <= 12
      (u.toLong, a, if (conv) 1.0 else 0.0)
    }
    val df = rows.toDF("u", "isa", "s")
    val got = Stats.twoProportionZTest(df, "u", col("isa"), col("s") === 1.0)
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().head
    assert(got._1 == 10L && got._2 == 10L && got._3 == 8L && got._4 == 2L)
    // z = (0.8-0.2)/sqrt(0.5*0.5*(0.2)) = 0.6/sqrt(0.05) ≈ 2.683282
    assert(math.abs(got._7 - 2.683282) < 1e-6, got.toString)
    assert(got._8, "must be significant at 95%")
    val degenerate = Stats.twoProportionZTest(df, "u", col("isa"), lit(true))
      .select("z_stat").as[Option[Double]].collect().head
    assert(degenerate.isEmpty, "all-convert pool must yield null z")
  }

  test("kaplanMeier: hand-computed curve; censoring; pre-start terminal ignored") {
    def d(day: Long, off: Long = 0L) = ts(day * 86400000000L + off)
    val ev = Seq(
      // user 1: signup day 0, error day 2 → observed at day 2
      (1L, d(0), "signup"), (1L, d(2), "error"),
      // user 2: signup day 0, no error, last activity day 5 → censored 5
      (2L, d(0), "signup"), (2L, d(5), "view"),
      // user 3: error BEFORE signup must not match; error day 4 after
      // signup day 2 → observed at day 2
      (3L, d(1), "error"), (3L, d(2), "signup"), (3L, d(4), "error"),
      // user 4: never signs up → excluded
      (4L, d(0), "view"))
      .toDF("u", "t", "ty")
    val got = graft.ops.Survival.kaplanMeier(ev, "u", "t", "ty",
        "signup", "error")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // day 2: 2 events of 3 at risk → km 1/3; day 5: censor only, km holds.
    assert(got == Seq((2L, 3L, 2L, 0L, 0.333333), (5L, 1L, 0L, 1L, 0.333333)),
      got.toString)
  }

  test("keyUniqueness: flags duplicate keys with multiplicity; unique table reads clean") {
    val dup = Seq(1L, 1L, 2L, 3L).toDF("k")
    val uniq = Seq(10L, 11L).toDF("k")
    val got = DataQuality.keyUniqueness(Seq(
        DataQuality.KeyedTable("dup", dup, "k"),
        DataQuality.KeyedTable("uniq", uniq, "k")))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("dup") == ((4L, 3L, 1L, 2L)), got.toString)
    assert(got("uniq") == ((2L, 2L, 0L, 1L)), got.toString)
  }

  test("zipfSlope: exact power-law corpus recovers slope -1") {
    // Frequencies 12/rank: 12, 6, 4, 3 → ln(freq) = ln 12 − 1·ln(rank).
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.zipfSlope(docs, "text", topV = 100)
      .as[(Long, Double, Double)].collect().head
    assert(got._1 == 4L, got.toString)
    assert(got._2 == -1.0, s"perfect power law must fit slope -1: $got")
    assert(math.abs(got._3 - math.log(12.0)) < 1e-3, got.toString)
  }

  test("phraseSearch: counts occurrences incl. overlaps; absent docs omitted") {
    val docs = Seq(
      (1L, "the quick fox and the quick fox again"),
      (2L, "quick fox"),
      (3L, "the fox quick"),           // right words, wrong order
      (4L, "a a a a"))                 // overlap probe
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("quick", "fox"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L), got.toString)
    val overlaps = graft.ops.TextAnalysis.phraseSearch(docs, "doc_id", "text",
        Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(overlaps == Map(4L -> 3L), overlaps.toString)
  }

  test("topPaths: consecutive triples counted per user; deterministic tie order") {
    val ev = Seq(
      (1L, ts(1000000L), 1L, "a"), (1L, ts(2000000L), 2L, "b"),
      (1L, ts(3000000L), 3L, "c"), (1L, ts(4000000L), 4L, "a"),
      (2L, ts(1000000L), 5L, "a"), (2L, ts(2000000L), 6L, "b"),
      (2L, ts(3000000L), 7L, "c"))
      .toDF("u", "t", "id", "s")
    val got = graft.ops.Funnel.topPaths(ev, "u", "t", "id", "s", k = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.head == (("a", "b", "c", 2L)), got.toString)
    assert(got.toSet == Set(("a", "b", "c", 2L), ("b", "c", "a", 1L)),
      got.toString)
  }

  test("cupedAdjusted: matches the closed form; covariate removes most variance") {
    // y tracks x closely; arm A carries a true +2.5 effect.
    val rows = Seq(
      (1L, true, 10.0, 12.5), (2L, true, 20.0, 22.5),
      (3L, false, 12.0, 12.0), (4L, false, 22.0, 22.0))
    val df = rows.toDF("u", "isa", "x", "y")
    val got = Stats.cupedAdjusted(df, "u", col("isa"), col("y"), col("x"))
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    // Reference: identical formula in plain Scala.
    val xs = rows.map(_._3); val ys = rows.map(_._4); val n = 4.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val adj = rows.map { case (_, _, x, y) => y - theta * (x - sx / n) }
    val ma = adj.zip(rows).collect { case (a, r) if r._2 => a }
    val mb = adj.zip(rows).collect { case (a, r) if !r._2 => a }
    assert(got._1 == 2L && got._2 == 2L)
    assert(math.abs(got._3 - ma.sum / 2) < 1e-6, got.toString)
    assert(math.abs(got._4 - mb.sum / 2) < 1e-6, got.toString)
    assert(math.abs(got._5 - theta) < 1e-6, got.toString)
    assert(got._6 > 0.9, s"tight covariate must remove most variance: $got")
    assert(math.abs(got._7 - (ma.sum / 2 - mb.sum / 2)) < 1e-5, got.toString)
  }

  test("periodGrowth: growth vs the lagged period; leading periods null") {
    def d(ym: (Int, Int)) = java.sql.Timestamp.valueOf(
      f"${ym._1}%04d-${ym._2}%02d-15 00:00:00")
    val df = Seq(
      ((2023, 1), 100.0), ((2023, 2), 200.0),
      ((2024, 1), 150.0), ((2024, 2), 100.0))
      .map { case (ym, v) => (d(ym), v) }.toDF("t", "v")
    val got = Stats.periodGrowth(df, "t", "v", lagPeriods = 12)
      .as[(Int, Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(202301) == ((100.0, None)), got.toString)
    assert(got(202401) == ((150.0, Some(0.5))), got.toString)
    assert(got(202402) == ((100.0, Some(-0.5))), got.toString)
  }

  test("gini: even distribution 0; full concentration near 1") {
    val even = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))
      .toDF("k", "v")
    val g1 = Stats.gini(even, "k", "v").as[(Long, Double)].collect().head
    assert(g1 == ((4L, 0.0)), g1.toString)
    val skew = Seq((1L, 0.01), (2L, 0.01), (3L, 0.01), (4L, 1000.0))
      .toDF("k", "v")
    val g2 = Stats.gini(skew, "k", "v").as[(Long, Double)].collect().head
    assert(g2._2 > 0.7, s"concentrated distribution: $g2")
  }

  test("paretoDeciles: shares sum to 1; cumulative share monotone to 1") {
    val df = (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val got = Stats.paretoDeciles(df, "k", "v")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 10 && got.forall(_._2 == 4L), got.mkString(","))
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6)
    assert(got.last._4 == 1.0, got.last.toString)
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
    // decile 1 holds the TOP values: 37..40 of Σ1..40 = 154/820
    assert(math.abs(got.head._3 - 154.0 / 820.0) < 1e-5, got.head.toString)
  }

  test("withinRadius: haversine degree-of-latitude sanity; outside points filtered") {
    val pts = Seq((1L, 1.0, 0.0), (2L, 0.1, 0.0), (3L, 5.0, 0.0))
      .toDF("id", "lat", "lon")
    val got = graft.ops.Trajectory.withinRadius(pts, "id", "lat", "lon",
        centerLat = 0.0, centerLon = 0.0, radiusKm = 150.0)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    // 1° of latitude on the R=6371 sphere: 2π·6371/360 ≈ 111.1949 km.
    assert(math.abs(got(1L) - 111.1949) < 0.001, got.toString)
    assert(math.abs(got(2L) - 11.1195) < 0.001, got.toString)
  }

  test("madOutliers: robust to the outlier that breaks a z-score; clean group zero") {
    val rows = (1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)
    val clean = (1 to 10).map(i => ("b", i.toDouble))
    val got = DataQuality.madOutliers((rows ++ clean).toDF("g", "v"), "g", "v")
      .select("g", "n", "median", "mad", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // group a: median 5.5, deviations {0.5..4.5, 994.5} → MAD 2.5;
    // threshold 3·1.4826·2.5 ≈ 11.1 → exactly the 1000.0 row flags.
    assert(got("a") == ((10L, 5.5, 2.5, 1L)), got.toString)
    assert(got("b")._4 == 0L, got.toString)
  }

  test("rfmQuintiles: recency anchored at the corpus max; best entities score 1") {
    def d(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // 5 customers, one order each except c1 (3 orders, latest, biggest).
    val orders = Seq(
      (1L, d(100), 500.0), (1L, d(90), 10.0), (1L, d(80), 10.0),
      (2L, d(99), 400.0), (3L, d(98), 300.0), (4L, d(97), 200.0),
      (5L, d(96), 100.0))
      .toDF("k", "t", "v")
    val got = Stats.rfmQuintiles(orders, "k", "t", "v")
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 0L && got(1L)._3 == 3L && got(1L)._4 == 520.0)
    assert(got(1L)._5 == 1 && got(1L)._6 == 1 && got(1L)._7 == 1,
      s"best customer scores 1/1/1: ${got(1L)}")
    assert(got(5L)._2 == 4L && got(5L)._5 == 5 && got(5L)._7 == 5,
      s"worst recency/monetary scores 5: ${got(5L)}")
  }

  test("targetEncodeLoo: self-excluded category mean; singleton yields null") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 5.0))
      .toDF("id", "cat", "v")
    val got = Stats.targetEncodeLoo(df, "id", "cat", "v")
      .select("id", "loo_mean").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(25.0),   // (20+30)/2
      2L -> Some(20.0),   // (10+30)/2
      3L -> Some(15.0),   // (10+20)/2
      4L -> None), got.toString)
  }

  test("transitionMatrix: ML estimate; per-from probabilities sum to 1") {
    val rows = Seq(
      (1L, ts(1000000L), 1L, "a"), (1L, ts(2000000L), 2L, "b"),
      (1L, ts(3000000L), 3L, "a"), (1L, ts(4000000L), 4L, "a"),
      (2L, ts(1000000L), 5L, "b"), (2L, ts(2000000L), 6L, "a"))
      .toDF("u", "t", "id", "s")
    val got = DataQuality.transitionMatrix(rows.toDF("u", "t", "id", "s"),
        "u", "t", "id", "s")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((2L, 1.0))), got.toString)
  }
}
