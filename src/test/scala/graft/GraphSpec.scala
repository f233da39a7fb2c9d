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

  test("pagerank: directed chain feeds rank downstream (with back edges, no dangling)") {
    // a -> b -> c -> a ring: perfectly symmetric cycle → all equal.
    val ring = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = Graph.pagerank(ring, "src", "dst", iterations = 9)
      .as[(String, Double)].collect().toMap
    assert(got.values.toSet.size == 1, s"ring symmetry: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }
}
