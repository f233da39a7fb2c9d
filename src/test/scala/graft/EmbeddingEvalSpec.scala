package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.EmbeddingEval

/** Hand-computable fixtures for the label-aware embedding evaluators.
  * Vectors live on the 2-D axes so cosines are exactly 0 or 1 and every
  * expected value can be derived on paper.
  */
class EmbeddingEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two perfectly separated clusters on orthogonal axes: label "x" along
  // (1,0), label "y" along (0,1). Within-cluster cosine = 1 (distance 0),
  // cross-cluster cosine = 0 (distance 1).
  private def axisEmb = Seq(
    (1L, Array(1.0f, 0.0f), "x"),
    (2L, Array(2.0f, 0.0f), "x"),
    (3L, Array(3.0f, 0.0f), "x"),
    (4L, Array(0.0f, 1.0f), "y"),
    (5L, Array(0.0f, 2.0f), "y"),
    (6L, Array(0.0f, 3.0f), "y")
  ).toDF("vec_id", "embedding", "label")

  test("knnLabelAccuracy: separable clusters score 1.0; k excludes self") {
    val got = EmbeddingEval.knnLabelAccuracy(axisEmb, axisEmb,
        "vec_id", "embedding", "label", k = 2)
      .select("label", "n_queries", "n_correct", "accuracy")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("x", 3L, 3L, 1.0), ("y", 3L, 3L, 1.0)))
  }

  test("knnLabelAccuracy: majority vote ties break to the smallest label") {
    // One query of label "b" whose 2-NN are one "a" and one "c" (equal
    // cosine): vote 1-1, tie → "a" (smallest label) → incorrect for "b".
    val corpus = Seq(
      (1L, Array(1.0f, 1.0f), "b"),  // the query
      (2L, Array(1.0f, 0.0f), "a"),  // cos = 1/√2 to query
      (3L, Array(0.0f, 1.0f), "c")   // cos = 1/√2 to query
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingEval.knnLabelAccuracy(corpus,
        corpus.filter(col("vec_id") === 1L),
        "vec_id", "embedding", "label", k = 2)
      .select("label", "n_correct").as[(String, Long)].collect().toSeq
    assert(got == Seq(("b", 0L)))
  }

  test("silhouetteSimplified: orthogonal clusters give s = 1 everywhere") {
    // a = 1 − cos(point, own centroid) = 0; b = 1 − 0 = 1 → s = 1.
    val got = EmbeddingEval.silhouetteSimplified(axisEmb,
        "vec_id", "embedding", "label")
      .select("label", "n", "mean_silhouette")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("x", 3L, 1.0), ("y", 3L, 1.0)))
  }

  test("silhouetteSimplified: a point between two centroids scores 0") {
    // Clusters on the axes plus one "x"-labeled point on the diagonal:
    // its distance to both centroids is identical → s = 0 for that point.
    val emb = axisEmb.union(Seq(
      (7L, Array(1.0f, 1.0f), "x")).toDF("vec_id", "embedding", "label"))
    val diag = EmbeddingEval.silhouetteSimplified(emb,
        "vec_id", "embedding", "label")
      .filter(col("label") === "x").select("mean_silhouette")
      .as[Double].collect().head
    // x-cluster: centroid stays on (1,0)·c + diagonal pull; the three axis
    // points keep s near 1, the diagonal point scores ~0 → mean < 1.
    assert(diag > 0.0 && diag < 1.0)
  }

  test("conformalThresholds: q̂ is the ⌈(n+1)(1−α)⌉-th smallest score") {
    // 9 points of one label at controlled angles: score = 1 − cos₆ to the
    // centroid. With n = 9, α = 10% → r = min(9, ⌈10 · 0.9⌉) = 9 → q̂ is
    // the MAX score and coverage = 1.0. With α = 50% → r = 5 → the median.
    val one = (1L to 9L).map { i =>
      val t = (i - 1).toDouble / 16.0 // angles 0 .. π/2·(8/16)
      (i, Array(math.cos(t).toFloat, math.sin(t).toFloat), "only")
    }.toDF("vec_id", "embedding", "label")
    val strict = EmbeddingEval.conformalThresholds(one,
        "vec_id", "embedding", "label", alphaBp = 1000)
      .select("n", "coverage").as[(Long, Double)].collect().head
    assert(strict == ((9L, 1.0)))
    val half = EmbeddingEval.conformalThresholds(one,
        "vec_id", "embedding", "label", alphaBp = 5000)
      .select("coverage").as[Double].collect().head
    // r = ⌈10 · 0.5⌉ = 5 of 9 → coverage 5/9 (scores are all distinct).
    assert(math.abs(half - 5.0 / 9.0) < 1e-6)
  }

  test("assignClusters routes each vector to its nearest centroid, not its label") {
    // A "y"-labeled point lying on the x axis must assign to cluster of
    // the x centroid regardless of its own label.
    val emb = axisEmb.union(
      Seq((7L, Array(5.0f, 0.0f), "y")).toDF("vec_id", "embedding", "label"))
    // Numeric cluster ids: x-cluster = 0, y-cluster = 1.
    val cent = graft.ops.Similarity.centroids(
      emb.withColumn("cl", when(col("label") === "x", 0L).otherwise(1L))
        .filter(col("vec_id") <= 6L), // fit on the clean axis points only
      "cl", "embedding")
    val got = EmbeddingEval.assignClusters(emb, "vec_id", "embedding", cent, "cl")
      .as[(Long, Long)].collect().toMap
    assert(got(7L) == 0L) // the stray y-labeled point routes to x
    assert(got(1L) == 0L && got(4L) == 1L)
  }

  test("clusterBalancedSample: equal shares, largest-remainder +1, deterministic") {
    // 6 x-vectors, 3 y-vectors, totalN = 5 over k = 2 clusters:
    // base = 2, remainder 1 → the LARGER cluster (x) gets 3, y gets 2.
    val emb = ((1L to 6L).map(i => (i, Array(i.toFloat, 0.0f), 0L)) ++
      (7L to 9L).map(i => (i, Array(0.0f, i.toFloat), 1L)))
      .toDF("vec_id", "embedding", "cl")
    val cent = graft.ops.Similarity.centroids(emb, "cl", "embedding")
    val got = EmbeddingEval.clusterBalancedSample(emb, "vec_id", "embedding",
        cent, "cl", totalN = 5)
      .as[(Long, Long)].collect().toSeq
    val byCluster = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCluster == Map(0L -> 3, 1L -> 2), s"got $byCluster")
    // Deterministic: a second run returns the identical set.
    val again = EmbeddingEval.clusterBalancedSample(emb, "vec_id", "embedding",
        cent, "cl", totalN = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got.toSet == again.toSet)
  }

  test("clusterBalancedSample: quota caps at cluster size (totalN is a ceiling)") {
    // One singleton cluster: quotas (5, 5) cap to (5, 1) → 6 rows out.
    val emb = ((1L to 20L).map(i => (i, Array(i.toFloat, 0.0f), 0L)) ++
      Seq((21L, Array(0.0f, 1.0f), 1L)))
      .toDF("vec_id", "embedding", "cl")
    val cent = graft.ops.Similarity.centroids(emb, "cl", "embedding")
    val got = EmbeddingEval.clusterBalancedSample(emb, "vec_id", "embedding",
        cent, "cl", totalN = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 6)
    assert(got.count(_._2 == 1L) == 1)
  }

  test("mmrRerank: redundancy penalty promotes the diverse candidate") {
    // Query 100 on the x axis. c1/c2 are near-duplicates hugging the
    // axis (c1 slightly more relevant); c3 is near-orthogonal (less
    // relevant, but diverse). At λ = 0.3 the second pick trades off
    // mmr(c2) = 0.3·0.9998 − 0.7·0.99995 ≈ −0.400 against
    // mmr(c3) = 0.3·0.3011 − 0.7·0.3107 ≈ −0.127 → c3 wins.
    val corpus = Seq(
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(1.0f, 0.02f)),
      (3L, Array(0.3f, 0.95f))).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = EmbeddingEval.mmrRerank(corpus, queries, "vec_id", "embedding",
        poolK = 3, selectK = 3, lambdaBp = 3000)
      .select("cand_id", "mmr_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq
    assert(got == Seq(1L, 3L, 2L), got.toString)
  }

  test("mmrRerank at λ = 10000 reduces to pure relevance order") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(1.0f, 0.02f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val mmr = EmbeddingEval.mmrRerank(corpus, queries, "vec_id", "embedding",
        poolK = 3, selectK = 3, lambdaBp = 10000)
      .select("cand_id", "mmr_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq
    val brute = graft.ops.Similarity.bruteForceKnn(corpus, queries,
        "vec_id", "embedding", k = 3)
      .select("cand_id", "rn").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1).toSeq
    assert(mmr == brute, s"$mmr vs $brute")
  }

  test("conformalThresholds rejects alphaBp outside (0, 10000)") {
    intercept[IllegalArgumentException] {
      EmbeddingEval.conformalThresholds(axisEmb,
        "vec_id", "embedding", "label", alphaBp = 0)
    }
    intercept[IllegalArgumentException] {
      EmbeddingEval.conformalThresholds(axisEmb,
        "vec_id", "embedding", "label", alphaBp = 10000)
    }
  }
}
