package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a one-pass typed `Aggregator` (SURVEY.md §2.11
  * item 4 family) — the scale-correct alternative to the
  * `row_number().over(Window)` formulation for O1–O3-style "top orders
  * per customer" reports.
  *
  * Why it matters at 100 TB: the window form shuffles EVERY fact row to
  * its group's partition and sorts whole partitions before discarding all
  * but k rows per group. This aggregate keeps a bounded k-slot buffer per
  * group, reduces map-side (partial aggregation), and the shuffle carries
  * k (id, score) pairs per group — rows × (16 bytes) → groups × k × 16
  * bytes, typically a 100–1000× exchange reduction, with no sort at all.
  *
  * Ordering contract (matches the window gates): best = highest score,
  * ties broken by LOWEST id. Buffer slots start at the absolute-worst
  * sentinel (score = -∞, id = Long.MaxValue), so any real row displaces
  * them; rows scoring -∞ with id Long.MaxValue are indistinguishable
  * from empties by construction and are the one excluded input.
  *
  * The reduce/merge scan is O(k) per row with zero allocation — for the
  * small k of reporting queries (≤ ~100) that beats a heap's constant
  * factors and stays branch-predictable.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), (Array[Long], Array[Double]), Array[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: (Array[Long], Array[Double]) =
    (Array.fill(k)(Long.MaxValue), Array.fill(k)(Double.NegativeInfinity))

  // True when (s1, i1) ranks strictly better than (s2, i2):
  // higher score wins, equal scores break toward the smaller id.
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  @inline private def insert(buf: (Array[Long], Array[Double]),
                             id: Long, score: Double): Unit = {
    val (ids, scores) = buf
    // Find the worst occupied slot; replace it iff the new row beats it.
    var worst = 0
    var j = 1
    while (j < k) {
      if (beats(scores(worst), ids(worst), scores(j), ids(j))) worst = j
      j += 1
    }
    if (beats(score, id, scores(worst), ids(worst))) {
      ids(worst) = id
      scores(worst) = score
    }
  }

  override def reduce(buf: (Array[Long], Array[Double]),
                      row: (Long, Double)): (Array[Long], Array[Double]) = {
    insert(buf, row._1, row._2)
    buf
  }

  override def merge(a: (Array[Long], Array[Double]),
                     b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    var j = 0
    while (j < k) {
      if (b._2(j) != Double.NegativeInfinity || b._1(j) != Long.MaxValue)
        insert(a, b._1(j), b._2(j))
      j += 1
    }
    a
  }

  override def finish(buf: (Array[Long], Array[Double])): Array[(Long, Double)] = {
    val filled = buf._1.indices
      .filterNot(j => buf._2(j) == Double.NegativeInfinity && buf._1(j) == Long.MaxValue)
      .map(j => (buf._1(j), buf._2(j)))
    filled.sortWith { case ((i1, s1), (i2, s2)) => beats(s1, i1, s2, i2) }.toArray
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    Encoders.tuple(ExpressionEncoder[Array[Long]](), ExpressionEncoder[Array[Double]]())
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    ExpressionEncoder[Array[(Long, Double)]]()
}
