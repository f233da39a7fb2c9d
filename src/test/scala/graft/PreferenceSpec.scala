package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Preference

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bradleyTerry: symmetric head-to-head record gives equal strengths") {
    val pairs = Seq(("a", "b"), ("b", "a")).toDF("winner", "loser")
    val got = Preference.bradleyTerry(pairs, "winner", "loser", rounds = 3)
      .select("item", "wins", "strength")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 0.5), ("b", 1L, 0.5)))
  }

  test("bradleyTerry: transitive dominance orders strengths; Σ = 1") {
    // a beats b and c twice each; b beats c twice → a > b > c.
    val pairs = Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("a", "c"),
      ("b", "c"), ("b", "c")).toDF("winner", "loser")
    val got = Preference.bradleyTerry(pairs, "winner", "loser", rounds = 5)
      .select("item", "strength").as[(String, Double)].collect().toMap
    assert(got("a") > got("b") && got("b") > got("c"), got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-5, got.toString)
  }

  test("bradleyTerry: a never-winning item pins to 0 and never poisons peers") {
    val pairs = Seq(("a", "c"), ("b", "c"), ("a", "b"), ("b", "a"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(pairs, "winner", "loser", rounds = 3)
      .select("item", "wins", "strength")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val byItem = got.map(r => r._1 -> r).toMap
    assert(byItem("c")._2 == 0L && byItem("c")._3 == 0.0, got.toString)
    assert(byItem("a")._3 == byItem("b")._3, // identical records
      got.toString)
    assert(byItem("a")._3 > 0.0)
  }

  test("bradleyTerry drops null and self pairs before counting") {
    val pairs = Seq(("a", "b"), ("a", "a"), (null, "b"), ("b", null))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(pairs, "winner", "loser", rounds = 2)
      .select("item", "wins").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 0L)))
  }
}
