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

/** Candidate-budget top-k WITH RE-RANK PAYLOAD — the streaming face of
  * the matryoshka serve stack's closing stages (L295): the buffer keeps
  * the top `candidates` rows by PREFIX cosine (the candidate-generation
  * metric; ties → lowest id, matching [[TopKAgg]] and the batch window
  * gates), each carrying its FULL-dimension cosine as payload, and
  * `finish` re-ranks the surviving candidates by the full metric and
  * emits top `k` (id, full_cosine) pairs.
  *
  * Semantics match `Similarity.ivfTruncatedRerankKnn` exactly: candidate
  * cut by (pcos desc, id asc), final order by (fcos desc, id asc).
  * Because the candidate buffer accumulates across micro-batches, a
  * query whose probed clusters straddle triggers refines toward the same
  * answer a batch run over the union produces. State per query key is
  * `candidates` (id, pcos, fcos) triples — bounded by the candidate
  * budget, never the scored set.
  */
case class TopKRerankAgg(k: Int, candidates: Int)
    extends Aggregator[(Long, Double, Double),
      (Array[Long], Array[Double], Array[Double]), Array[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")
  require(candidates >= k, s"candidate budget must cover k: $candidates < $k")

  override def zero: (Array[Long], Array[Double], Array[Double]) =
    (Array.fill(candidates)(Long.MaxValue),
      Array.fill(candidates)(Double.NegativeInfinity),
      Array.fill(candidates)(Double.NegativeInfinity))

  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  @inline private def insert(buf: (Array[Long], Array[Double], Array[Double]),
                             id: Long, pcos: Double, fcos: Double): Unit = {
    val (ids, pscores, fscores) = buf
    // Dedupe by candidate id FIRST: the same (query, cand) row replayed
    // across micro-batches (or straddling merged partial buffers) must
    // refresh its existing slot, never occupy a second one — duplicate
    // ids in the buffer would emit twice in the final top-k and displace
    // genuine candidates, diverging from the batch ivfTruncatedRerankKnn
    // this aggregator mirrors. (id = Long.MaxValue is the empty-slot
    // sentinel with -inf score; a real row with that id and a real score
    // would beat every sentinel, so the scan below treats it correctly.)
    var j = 0
    while (j < candidates) {
      if (ids(j) == id && pscores(j) != Double.NegativeInfinity) {
        if (pcos > pscores(j)) { pscores(j) = pcos; fscores(j) = fcos }
        return
      }
      j += 1
    }
    var worst = 0
    j = 1
    while (j < candidates) {
      if (beats(pscores(worst), ids(worst), pscores(j), ids(j))) worst = j
      j += 1
    }
    if (beats(pcos, id, pscores(worst), ids(worst))) {
      ids(worst) = id
      pscores(worst) = pcos
      fscores(worst) = fcos
    }
  }

  override def reduce(buf: (Array[Long], Array[Double], Array[Double]),
                      row: (Long, Double, Double)): (Array[Long], Array[Double], Array[Double]) = {
    insert(buf, row._1, row._2, row._3)
    buf
  }

  override def merge(a: (Array[Long], Array[Double], Array[Double]),
                     b: (Array[Long], Array[Double], Array[Double])): (Array[Long], Array[Double], Array[Double]) = {
    var j = 0
    while (j < candidates) {
      if (b._2(j) != Double.NegativeInfinity || b._1(j) != Long.MaxValue)
        insert(a, b._1(j), b._2(j), b._3(j))
      j += 1
    }
    a
  }

  override def finish(buf: (Array[Long], Array[Double], Array[Double])): Array[(Long, Double)] = {
    val filled = buf._1.indices
      .filterNot(j => buf._2(j) == Double.NegativeInfinity && buf._1(j) == Long.MaxValue)
      .map(j => (buf._1(j), buf._3(j)))
    filled.sortWith { case ((i1, s1), (i2, s2)) => beats(s1, i1, s2, i2) }
      .take(k).toArray
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Double], Array[Double])] =
    Encoders.tuple(ExpressionEncoder[Array[Long]](),
      ExpressionEncoder[Array[Double]](), ExpressionEncoder[Array[Double]]())
  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    ExpressionEncoder[Array[(Long, Double)]]()
}
