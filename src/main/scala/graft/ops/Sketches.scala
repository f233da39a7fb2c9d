package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CatalystBridge

/** Approximate/sketch operators — the 100 TB answer when the exact
  * operator's shuffle or state is the bottleneck and a bounded error is
  * acceptable:
  *
  *   - [[approxGroupQuantiles]]: per-group quantiles in ONE aggregation
  *     pass (mergeable digests), where exact per-group quantiles need a
  *     full sort of every group. Error bounded by `accuracy`.
  *   - [[approxDistinct]]: HyperLogLog++ distinct counts — constant state
  *     per group vs a distinct-shuffle of every value. Relative standard
  *     deviation configurable.
  *   - [[bloomFit]] / [[mightContain]]: corpus-membership pre-filter —
  *     the "is this id in the 10B-row reference set" semi-join WITHOUT a
  *     join: the fitted filter ships to executors as a literal and the
  *     probe is a map-side expression (same mechanism as Spark's runtime
  *     bloom pushdown, here as an explicit reusable artifact). No false
  *     negatives; false-positive rate set at fit time.
  *   - [[countMinSketch]]: heavy-hitter frequency estimation in fixed
  *     memory (depth×width counters) — the approximate counterpart of
  *     [[TextAnalysis.heavyHitters]] when even the token-count shuffle is
  *     too much; estimates are upper bounds (ε-overcount with probability
  *     1-δ), never undercounts.
  *
  * These are deliberately SPEC-covered, not oracle-gated: their outputs
  * are approximation-dependent, so the contract is an error BOUND
  * (asserted against exact computations in `SketchesSpec`), not a value
  * DuckDB could reproduce.
  */
object Sketches {

  /** Per-group approximate quantiles via mergeable digests
    * (`percentile_approx`): one hash-aggregation, no per-group sort.
    * Output: groupCol, q_&lt;pct&gt; columns (doubles).
    */
  def approxGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                           probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    // Name by the prob itself (q_0_5, q_0_999) — rounding to a percent
    // would collide for tail probs like 0.999 vs 0.9999.
    val names = probs.map(p => s"q_${p.toString.replace('.', '_')}")
    require(names.distinct.size == names.size, s"duplicate probs: $probs")
    val aggs = probs.zip(names).map { case (p, name) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(name)
    }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group HyperLogLog++ distinct count; `rsd` = target relative
    * standard deviation (Spark default 0.05).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Fit a Bloom filter over a key column: one aggregation, the sketch
    * (few MB for billions of items at moderate fpp) returns to the driver
    * as the reusable membership ARTIFACT. Uses Spark's native
    * `BloomFilterAggregate` (the engine the runtime bloom-join pushdown
    * uses) over `xxhash64(key)`.
    */
  def bloomFit(df: DataFrame, keyCol: String, expectedItems: Long,
               numBits: Long): Array[Byte] = {
    val agg = org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        CatalystBridge.expression(xxhash64(col(keyCol))),
        CatalystBridge.expression(lit(expectedItems)),
        CatalystBridge.expression(lit(numBits)), 0, 0)
    val bytes = df.agg(CatalystBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes != null) bytes
    else {
      // Zero input rows → the aggregate returns null; hand back a real
      // EMPTY filter (same serialization the aggregate uses) so probes
      // see "member of the empty set: false" instead of an analysis
      // error about a NullType literal far from the fit site.
      val empty = org.apache.spark.util.sketch.BloomFilter.create(1L, numBits)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      out.toByteArray
    }
  }

  /** Map-side membership probe against a fitted filter: no join, no
    * shuffle — the filter is a plan-time literal. False positives at the
    * fitted rate; NO false negatives.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    CatalystBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        CatalystBridge.expression(lit(filter)),
        CatalystBridge.expression(xxhash64(key))))

  /** Count-min sketch over a column (driver artifact, fixed
    * depth×width memory): `estimateCount` is an upper bound on the true
    * frequency, over by at most ε·N with probability ≥ 1−δ.
    */
  def countMinSketch(df: DataFrame, colName: String, eps: Double,
                     confidence: Double,
                     seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)
}
