package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Sketch operators: the contract is an error BOUND against the exact
  * computation, not a reproducible value — hence specs, not oracle gates.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = {
    // 3 groups × 2000 values with distinct distributions.
    val rows = for (g <- 0 until 3; i <- 0 until 2000)
      yield (s"g$g", (i * (g + 1)).toDouble)
    rows.toDF("grp", "v")
  }

  test("approx group quantiles land within the digest's rank-error bound") {
    val probs = Seq(0.1, 0.5, 0.9)
    val approx = Sketches.approxGroupQuantiles(skewed, "grp", "v", probs,
        accuracy = 10000)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // accuracy=10000 → rank error ≤ 1/10000; on 2000 rows that is < 1 rank,
    // so the approximate quantile must BE an element within 1 rank of exact.
    for (g <- 0 until 3) {
      val mult = g + 1
      val (q10, q50, q90) = approx(s"g$g")
      assert(math.abs(q10 / mult - 200) <= 2, s"g$g q10=$q10")
      assert(math.abs(q50 / mult - 1000) <= 2, s"g$g q50=$q50")
      assert(math.abs(q90 / mult - 1800) <= 2, s"g$g q90=$q90")
    }
  }

  test("HLL++ distinct counts stay within 5 rsd of exact") {
    val df = (1 to 10000).map(i => (s"g${i % 2}", s"val_${i % 3000}"))
      .toDF("grp", "v")
    val approx = Sketches.approxDistinct(df, "grp", "v", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("grp").agg(countDistinct($"v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, ex) =>
      val ap = approx(g)
      assert(math.abs(ap - ex).toDouble / ex < 0.1,
        s"$g: approx $ap vs exact $ex drifted past 5 rsd")
    }
  }

  test("bloom membership: zero false negatives, fpp within ~3x of configured") {
    val members = (1L to 20000L).toDF("id")
    val filter = Sketches.bloomFit(members, "id",
      expectedItems = 20000L, numBits = 20000L * 16)
    // Every member must pass (no false negatives).
    val fn = members.filter(!Sketches.mightContain(filter, col("id"))).count()
    assert(fn == 0, s"bloom filters never have false negatives, got $fn")
    // Disjoint probe set: false-positive rate near the configured one
    // (16 bits/item ≈ 0.05%; allow generous slack for hash variance).
    val probes = (1000001L to 1040000L).toDF("id")
    val fp = probes.filter(Sketches.mightContain(filter, col("id"))).count()
    assert(fp.toDouble / 40000 < 0.01, s"fp rate ${fp.toDouble / 40000}")
  }

  test("bloom probe is map-side: no join, no exchange in the plan") {
    val members = (1L to 1000L).toDF("id")
    val filter = Sketches.bloomFit(members, "id", 1000L, 16000L)
    val probe = (1L to 100L).toDF("id")
      .filter(Sketches.mightContain(filter, col("id")))
    val p = probe.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"membership must not join or shuffle:\n${p.take(800)}")
  }

  test("count-min estimates are upper bounds within eps*N of truth") {
    val rows = (1 to 5000).map(i => s"tok${i % 100}") ++ Seq.fill(2000)("hot")
    val df = rows.toDF("tok")
    val cms = Sketches.countMinSketch(df, "tok", eps = 0.001, confidence = 0.99)
    val n = rows.size
    assert(cms.estimateCount("hot") >= 2000L, "CMS never undercounts")
    assert(cms.estimateCount("hot") <= 2000L + (0.001 * n).toLong + 1)
    assert(cms.estimateCount("tok7") >= 50L)
    assert(cms.estimateCount("absent_token") <= (0.001 * n).toLong + 1)
  }
}
