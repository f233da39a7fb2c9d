package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank: symmetric two-node graph splits rank evenly at any damping") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = Graph.pagerank(e, "src", "dst", iterations = 7, damping = 0.6)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.5), got.toString)
  }

  test("pagerank: undirected star matches the reference recurrence; ranks sum to 1") {
    // center c connected to leaves l1..l3, symmetrized.
    val undirected = Seq("l1", "l2", "l3").flatMap(l => Seq(("c", l), (l, "c")))
    val got = Graph.pagerank(undirected.toDF("src", "dst"), "src", "dst",
        iterations = 5, checkpointEvery = 2)
      .as[(String, Double)].collect().toMap
    // Reference: same recurrence run in plain Scala.
    var center = 0.25; var leaf = 0.25
    for (_ <- 1 to 5) {
      val c2 = 0.15 / 4 + 0.85 * (3 * leaf)       // center outdeg 3, leaves 1
      val l2 = 0.15 / 4 + 0.85 * (center / 3.0)
      center = c2; leaf = l2
    }
    assert(math.abs(got("c") - center) < 2e-6, s"${got("c")} vs $center")
    Seq("l1", "l2", "l3").foreach { l =>
      assert(math.abs(got(l) - leaf) < 2e-6, s"${got(l)} vs $leaf")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-5,
      s"undirected graph conserves rank mass: ${got.values.sum}")
    assert(got("c") > got("l1"), "hub must out-rank leaves")
  }

  test("pagerank handleDangling: arbitrary directed graph conserves Σrank = 1") {
    // a → b → c, c a pure sink (dangling); a a pure source (isolate).
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = Graph.pagerank(e, "src", "dst", iterations = 4,
        handleDangling = true).as[(String, Double)].collect().toMap
    // Reference recurrence in plain Scala: D = rank(c) each round;
    // every node gets (1−d)/3 + d·(inflow + D/3).
    var (ra, rb, rc) = (1.0 / 3, 1.0 / 3, 1.0 / 3)
    for (_ <- 1 to 4) {
      val d = rc
      val t = 0.15 / 3
      val (a2, b2, c2) =
        (t + 0.85 * (0.0 + d / 3), t + 0.85 * (ra + d / 3),
          t + 0.85 * (rb + d / 3))
      ra = a2; rb = b2; rc = c2
    }
    assert(math.abs(got("a") - ra) < 2e-6, s"${got("a")} vs $ra")
    assert(math.abs(got("b") - rb) < 2e-6, s"${got("b")} vs $rb")
    assert(math.abs(got("c") - rc) < 2e-6, s"${got("c")} vs $rc")
    assert(math.abs(got.values.sum - 1.0) < 1e-5,
      s"dangling redistribution conserves rank mass: ${got.values.sum}")
    // Without handling, the same graph leaks the sink's mass.
    val leaky = Graph.pagerank(e, "src", "dst", iterations = 4)
      .as[(String, Double)].collect().toMap
    assert(leaky.values.sum < 0.99,
      s"contract violation must visibly leak mass: ${leaky.values.sum}")
  }

  test("personalizedPagerank: path graph vs hand recurrence; seeds absorb all mass") {
    // Symmetrized path a—b—c, seed {a}: sparse frontier grows one hop
    // per round; with no dangling nodes Σrank stays exactly 1.
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("seed")
    val got = Graph.personalizedPagerank(e, "src", "dst", seeds, "seed",
        iterations = 3).as[(String, Double)].collect().toMap
    // Hand recurrence (d = 0.85, |S| = 1):
    // r1: a=0.15, b=0.85; r2: a=0.51125, b=0.1275, c=0.36125;
    // r3: a=0.2041875, b=0.741625, c=0.0541875.
    assert(math.abs(got("a") - 0.2041875) < 1e-5, got.toString)
    assert(math.abs(got("b") - 0.741625) < 1e-5, got.toString)
    assert(math.abs(got("c") - 0.0541875) < 1e-5, got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-5, got.toString)
  }

  test("hits: bipartite star matches the closed-form one-round solution") {
    // h1→{a1,a2}, h2→a1. One round: auth ∝ (2, 1)/√5; hub ∝ (3, 2)/√13.
    val e = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1")).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iterations = 1)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(got("a1")._2 - 2.0 / math.sqrt(5)) < 1e-5, got.toString)
    assert(math.abs(got("a2")._2 - 1.0 / math.sqrt(5)) < 1e-5, got.toString)
    assert(math.abs(got("h1")._1 - 3.0 / math.sqrt(13)) < 1e-5, got.toString)
    assert(math.abs(got("h2")._1 - 2.0 / math.sqrt(13)) < 1e-5, got.toString)
    // Bipartite: sources have no authority, sinks no hub score.
    assert(got("h1")._2 == 0.0 && got("a1")._1 == 0.0, got.toString)
  }

  test("labelPropagation: two disjoint triangles converge to their min ids") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val got = Graph.labelPropagation(tri.toDF("src", "dst"), "src", "dst",
        iterations = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), got.toString)
  }

  test("kcorePeel: pendant peels off; core survives; too-high k empties") {
    // Triangle {1,2,3} + pendant 4—1: 2-core = the triangle (pendant
    // removed in sweep 1, all remaining degrees 2).
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.kcorePeel(g, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got.toString)
    // 3-core of a triangle is empty.
    assert(Graph.kcorePeel(g, "src", "dst", k = 3, rounds = 3).count() == 0)
    // K4 is its own 3-core.
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b)
      yield (a.toLong, b.toLong)).toDF("src", "dst")
    val gotK4 = Graph.kcorePeel(k4, "src", "dst", k = 3, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(gotK4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      gotK4.toString)
  }

  test("adamicAdar: K4 pairwise scores; path pair; hub cap empties") {
    // K4: every unordered pair has exactly 2 common neighbors, each of
    // degree 3 → score 2/ln 3.
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b)
      yield (a.toLong, b.toLong)).toDF("src", "dst")
    val got = Graph.adamicAdar(k4, "src", "dst", minCommon = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 6, got.mkString(","))
    val expect = BigDecimal(2.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall(r => r._3 == 2L && math.abs(r._4 - expect) < 1e-9),
      got.mkString(","))
    // Path 1—2—3: pair (1,3) shares only node 2 (degree 2) → 1/ln 2.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gotP = Graph.adamicAdar(path, "src", "dst", minCommon = 1)
      .as[(Long, Long, Long, Double)].collect()
    val e2 = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gotP.toSeq == Seq((1L, 3L, 1L, e2)), gotP.mkString(","))
    // Hub cap below every center degree → nothing survives.
    val capped = Graph.adamicAdar(k4, "src", "dst", minCommon = 1,
      maxCenterDegree = 2)
    assert(capped.count() == 0)
  }

  test("triangleCounts: K4 gives 3 per node; squares give none; duplicates ignored") {
    // K4 on {1,2,3,4}: 4 triangles, each node in exactly 3.
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
    // A disjoint 4-cycle {10,11,12,13}: no triangles at all; one duplicate
    // edge must not double-count.
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L), (10L, 11L))
    val got = graft.ops.Graph.triangleCounts(
        (k4 ++ square).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
  }

  test("pairRules: hand-computed support, confidence, and lift") {
    // baskets: {x,y,z}, {x,y}, {x,z}, {y} → pair xy: 2, xz: 2, yz: 1.
    val baskets = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y"), (4L, "y")) // dup item collapses
      .toDF("b", "i")
    val got = graft.ops.Association.pairRules(baskets, "b", "i",
        minPairCount = 2L)
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // x count 3, y count 3, z count 2, baskets 4.
    assert(got.keySet == Set(("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")))
    val (pc, sup, conf, lift) = got(("x", "y"))
    assert(pc == 2L && sup == 0.5, got.toString)
    assert(math.abs(conf - 0.666667) < 1e-9, got.toString)
    assert(math.abs(lift - 0.888889) < 1e-9, got.toString) // (2/3)/(3/4)
    val (_, _, confZx, liftZx) = got(("z", "x"))
    assert(confZx == 1.0, got.toString)          // z always with x
    assert(math.abs(liftZx - 1.333333) < 1e-9, got.toString) // 1/(3/4)
  }

  test("pagerank: directed chain feeds rank downstream (with back edges, no dangling)") {
    // a -> b -> c -> a ring: perfectly symmetric cycle → all equal.
    val ring = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = Graph.pagerank(ring, "src", "dst", iterations = 9)
      .as[(String, Double)].collect().toMap
    assert(got.values.toSet.size == 1, s"ring symmetry: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }

  test("temporalReachability: a later-hop EARLIER arrival unlocks onward edges") {
    // Seed S=1. Edges: S–A @10, S–B @1, B–A @2, A–C @5.
    // Greedy first-reach finds A at hop 1 with arrival 10 and would then
    // block A–C (5 < 10). The time-respecting path S→B(1)→A(2)→C(5) is
    // valid: A's arrival IMPROVES to 2 at hop 2, which unlocks C at hop 3.
    val edges = Seq(
      (1L, 2L, 10L), // S–A
      (1L, 3L, 1L),  // S–B
      (3L, 2L, 2L),  // B–A
      (2L, 4L, 5L)   // A–C
    ).toDF("u", "v", "t")
    val got = Graph.temporalReachability(edges, "u", "v", "t",
        seeds = Seq(1L), hops = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(got == Map(
      1L -> ((0, None)),       // seed
      2L -> ((1, Some(2L))),   // A: first reached hop 1; arrival improved to 2
      3L -> ((1, Some(1L))),   // B
      4L -> ((3, Some(5L)))    // C: only via the improved-arrival path
    ), got.toString)
  }

  test("temporalReachability respects time: a backwards-in-time 2-hop path is NOT a chain") {
    // S–A @10, A–C @5 only: reaching C needs A→C at 5 after arriving at
    // A at 10 — invalid. C must be absent.
    val edges = Seq((1L, 2L, 10L), (2L, 4L, 5L)).toDF("u", "v", "t")
    val nodes = Graph.temporalReachability(edges, "u", "v", "t",
        seeds = Seq(1L), hops = 3)
      .select("node").as[Long].collect().toSet
    assert(nodes == Set(1L, 2L), nodes.toString)
  }
}
