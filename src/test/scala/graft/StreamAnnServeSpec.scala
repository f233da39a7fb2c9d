package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.streaming.StreamAnnServe

/** MemoryStream element type — top-level so the encoder needs no outer
  * scope (a spec-nested case class fails at newInstance time).
  */
case class AnnVec(vec_id: Long, embedding: Array[Float], label: Long)

/** Streaming ANN serving: micro-batched query vectors against a static
  * cluster-keyed store must match the batch IVF kNN on the same inputs,
  * across batch splits (the keyed top-k state refines, never dups).
  */
class StreamAnnServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Vec = AnnVec
  private def Vec(id: Long, emb: Array[Float], label: Long) =
    AnnVec(id, emb, label)

  // Two well-separated clusters on orthogonal axes + slight per-id jitter
  // so cosines are distinct and ranks deterministic.
  private def store = ((1L to 8L).map(i =>
    Vec(i, Array(1.0f, (i * 0.01).toFloat), 0L)) ++
    (9L to 16L).map(i => Vec(i, Array((i * 0.01).toFloat, 1.0f), 1L)))
    .toDF("vec_id", "embedding", "label")

  private def queryRows = Seq(
    Vec(101L, Array(1.0f, 0.05f), 0L),
    Vec(102L, Array(0.02f, 1.0f), 0L),
    Vec(103L, Array(1.0f, 0.11f), 0L))

  test("streamed IVF top-k equals batch ivfKnn, including across batch splits") {
    val st = store
    val idx = Similarity.ivfFit(st, "label", "embedding")
    val expected = Similarity.ivfKnn(st,
        queryRows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = 3, nprobe = 1, index = Some(idx))
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSet

    val input = MemoryStream[Vec](implicitly[org.apache.spark.sql.Encoder[Vec]], spark)
    val served = StreamAnnServe.serve(input.toDF(), st, idx,
      "vec_id", "embedding", "label", k = 3, nprobe = 1)
    val q = served.writeStream.outputMode("complete")
      .format("memory").queryName("ann_serve").start()
    try {
      // Split the queries across two triggers.
      input.addData(queryRows.take(1))
      q.processAllAvailable()
      input.addData(queryRows.drop(1))
      q.processAllAvailable()
      val got = spark.table("ann_serve")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == expected, s"stream/batch divergence:\n$got\nvs\n$expected")
    } finally q.stop()
  }

  test("streamed truncated+re-rank stack equals batch ivfTruncatedRerankKnn across splits") {
    // The full three-lever serve stack (L295) in streaming form: 4-dim
    // vectors whose PREFIX (first 2 dims) ranking provably differs from
    // the full ranking — the tail dims vary independently — so the
    // re-rank stage has real work, and a candidate budget (5) below the
    // probed cluster's size (8) so the truncated cut engages too.
    val st4 = ((1L to 8L).map(i => Vec(i,
      Array(1.0f, (i * 0.01).toFloat,
        ((i * 7) % 5 * 0.1).toFloat, ((i * 3) % 4 * 0.1).toFloat), 0L)) ++
      (9L to 16L).map(i => Vec(i,
        Array((i * 0.01).toFloat, 1.0f,
          ((i * 5) % 3 * 0.1).toFloat, ((i * 2) % 5 * 0.1).toFloat), 1L)))
      .toDF("vec_id", "embedding", "label")
    val idx = Similarity.ivfFit(st4, "label", "embedding")
    val qrows = Seq(
      Vec(101L, Array(1.0f, 0.05f, 0.2f, 0.1f), 0L),
      Vec(102L, Array(0.02f, 1.0f, 0.1f, 0.3f), 0L),
      Vec(103L, Array(1.0f, 0.11f, 0.0f, 0.2f), 0L))
    val expected = Similarity.ivfTruncatedRerankKnn(st4,
        qrows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = 3, nprobe = 1,
        prefixDims = 2, candidates = 5, index = Some(idx))
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSet

    val input = MemoryStream[Vec](implicitly[org.apache.spark.sql.Encoder[Vec]], spark)
    val served = graft.streaming.StreamAnnServe.serveTruncatedRerank(
      input.toDF(), st4, idx, "vec_id", "embedding", "label",
      k = 3, nprobe = 1, prefixDims = 2, candidates = 5)
    val q = served.writeStream.outputMode("complete")
      .format("memory").queryName("ann_serve_rerank").start()
    try {
      input.addData(qrows.take(1))
      q.processAllAvailable()
      input.addData(qrows.drop(1))
      q.processAllAvailable()
      val got = spark.table("ann_serve_rerank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == expected, s"stream/batch stack divergence:\n$got\nvs\n$expected")
    } finally q.stop()
    // The re-rank provably engages: the final (query, cand, rank) set is
    // NOT what prefix-only scoring produces — the tail dims invert at
    // least one candidate pair on this fixture.
    val prefixRank = Similarity.bruteForceKnn(
        st4.select(col("vec_id"),
          org.apache.spark.sql.functions.slice(col("embedding"), 1, 2)
            .as("embedding")),
        qrows.toDF("vec_id", "embedding", "label")
          .select(col("vec_id"),
            org.apache.spark.sql.functions.slice(col("embedding"), 1, 2)
              .as("embedding")),
        "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("cand_id"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    val reranked = expected.map(r => (r._1, r._2, r._4))
    assert(reranked != prefixRank,
      s"fixture must make the full-dim re-rank change the answer: $reranked")
  }

  test("replayed query rows refresh buffer slots instead of duplicating candidates") {
    // Round-14 advice #4 regression: the same (query, candidate) rows
    // arriving again in a later micro-batch (an at-least-once replay)
    // must REFRESH their existing buffer slots, never occupy second ones
    // — duplicate ids would emit twice in the final top-k and displace
    // genuine candidates, diverging from the batch ivfTruncatedRerankKnn
    // the stream claims to match exactly. Candidate budget (5) below the
    // probed cluster size (8) so displacement would be observable.
    val st4 = ((1L to 8L).map(i => Vec(i,
      Array(1.0f, (i * 0.01).toFloat,
        ((i * 7) % 5 * 0.1).toFloat, ((i * 3) % 4 * 0.1).toFloat), 0L)) ++
      (9L to 16L).map(i => Vec(i,
        Array((i * 0.01).toFloat, 1.0f,
          ((i * 5) % 3 * 0.1).toFloat, ((i * 2) % 5 * 0.1).toFloat), 1L)))
      .toDF("vec_id", "embedding", "label")
    val idx = Similarity.ivfFit(st4, "label", "embedding")
    val qrows = Seq(
      Vec(101L, Array(1.0f, 0.05f, 0.2f, 0.1f), 0L),
      Vec(102L, Array(0.02f, 1.0f, 0.1f, 0.3f), 0L))
    val expected = Similarity.ivfTruncatedRerankKnn(st4,
        qrows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = 3, nprobe = 1,
        prefixDims = 2, candidates = 5, index = Some(idx))
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSet

    val input = MemoryStream[Vec](implicitly[org.apache.spark.sql.Encoder[Vec]], spark)
    val served = graft.streaming.StreamAnnServe.serveTruncatedRerank(
      input.toDF(), st4, idx, "vec_id", "embedding", "label",
      k = 3, nprobe = 1, prefixDims = 2, candidates = 5)
    val q = served.writeStream.outputMode("complete")
      .format("memory").queryName("ann_serve_replay").start()
    try {
      input.addData(qrows)
      q.processAllAvailable()
      input.addData(qrows) // full replay of both queries
      q.processAllAvailable()
      val got = spark.table("ann_serve_replay")
        .as[(Long, Long, Double, Int)].collect().toSeq
      // No duplicate cand_id within a query's top-k...
      val dups = got.groupBy(r => (r._1, r._2)).filter(_._2.size > 1)
      assert(dups.isEmpty, s"replay duplicated candidates: $dups")
      // ...and the refreshed state still equals the batch answer.
      assert(got.toSet == expected,
        s"replayed stream diverged from batch:\n${got.toSet}\nvs\n$expected")
    } finally q.stop()
  }

  test("scoredCandidates only touches the probed cluster's store slice") {
    val st = store
    val idx = Similarity.ivfFit(st, "label", "embedding")
    val input = MemoryStream[Vec](implicitly[org.apache.spark.sql.Encoder[Vec]], spark)
    val cands = StreamAnnServe.scoredCandidates(input.toDF(), st, idx,
      "vec_id", "embedding", "label", nprobe = 1)
    val q = cands.writeStream.outputMode("append")
      .format("memory").queryName("ann_cands").start()
    try {
      input.addData(Seq(Vec(200L, Array(1.0f, 0.0f), 0L))) // x-axis query
      q.processAllAvailable()
      val got = spark.table("ann_cands").select("cand_id")
        .as[Long].collect().toSet
      assert(got == (1L to 8L).toSet, // never the y-cluster's 9..16
        s"x-axis query must only score cluster-0 candidates: $got")
    } finally q.stop()
  }
}
