package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass k-permutation MinHash signature as a typed `Aggregator`
  * (SURVEY.md §2.11 item 4: sketch-style custom aggregates).
  *
  * Versus the relational formulation (explode shingles × bands → min per
  * band), this computes the whole k-wide signature in a single partial
  * aggregation pass: the buffer is the running k minima, merged
  * associatively across partitions — the shuffle carries k longs per doc.
  *
  * Permutations use Kirsch-Mitzenmacher double hashing: the shingle's md5
  * yields two 64-bit lanes (h1, h2); permutation i's hash is h1 + i·h2
  * (wrapping). Deterministic everywhere the JVM is.
  */
case class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(shingle.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(d)
    val h1 = bb.getLong
    val h2 = bb.getLong
    var i = 0
    while (i < k) {
      val h = h1 + i * h2
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard similarity = fraction of agreeing signature slots. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
