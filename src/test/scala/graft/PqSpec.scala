package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Product quantization: codebook fit, encoding, reconstruction error, and
  * ADC retrieval.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 well-separated clusters in 8-dim (deterministic jitter), 6 vectors
  // each. Membership follows each id's md5 RANK (the same hash pqFit seeds
  // by), so the 3 smallest-hash ids land in 3 DISTINCT clusters — seeding
  // is then perfect by construction and Lloyd must converge; without this
  // the test would assert on a k-means local optimum, not on the operator.
  private def fixture = {
    val centers = Seq(
      Seq(10f, 10f, 0f, 0f, 0f, 0f, -10f, -10f),
      Seq(-10f, 0f, 10f, 0f, 0f, 10f, 0f, -10f),
      Seq(0f, -10f, 0f, 10f, -10f, 0f, 10f, 0f))
    def h(i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val rankOf = (0 until 18).sortBy(i => (h(i), i.toLong)).zipWithIndex.toMap
    (0 until 18).map { i =>
      val t = rankOf(i) % 3
      val c = centers(t)
      (i.toLong, t, c.zipWithIndex.map { case (v, j) =>
        v + 0.1f * (((i * 7 + j * 3) % 5) - 2)
      })
    }.toDF("vec_id", "truth", "embedding")
  }

  test("cluster-mates share codes; reconstruction error shrinks with k") {
    val emb = fixture
    val idx3 = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 3, iters = 3)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", idx3)
      .join(emb.select(col("vec_id"), col("truth")), Seq("vec_id"))
      .select(col("truth"), concat_ws(",", transform(col("codes"), _.cast("string"))).as("cs"),
        col("recon_d2"))
      .collect()
    val byTruth = enc.groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).toSet)
    byTruth.foreach { case (t, codes) =>
      assert(codes.size == 1, s"cluster $t fragments into codes $codes")
    }
    assert(byTruth.values.toSet.size == 3, "distinct clusters get distinct codes")
    val err3 = enc.map(_.getDouble(2)).sum
    val idx1 = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 1, iters = 1)
    val err1 = Similarity.pqEncode(emb, "vec_id", "embedding", idx1)
      .agg(sum(col("recon_d2"))).head().getDouble(0)
    assert(err3 < err1 / 10,
      s"3-code reconstruction ($err3) must beat 1-code ($err1) decisively")
  }

  test("ADC top-1 is a true cluster-mate on separated clusters") {
    val emb = fixture
    val idx = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 3, iters = 3)
    val queries = emb.filter(col("vec_id") < 3)
    val top1 = Similarity.pqAdcKnn(emb, queries, "vec_id", "embedding",
        k = 1, index = idx)
      .join(emb.select(col("vec_id").as("cand_id"), col("truth").as("cand_truth")), Seq("cand_id"))
      .join(emb.select(col("vec_id").as("query_id"), col("truth").as("query_truth")), Seq("query_id"))
      .collect()
    assert(top1.length == 3)
    top1.foreach { r =>
      assert(r.getAs[Int]("cand_truth") == r.getAs[Int]("query_truth"),
        s"ADC nearest must come from the query's own cluster: $r")
    }
  }

  test("IVF-PQ: nprobe=1 reads only the query's own cluster and still ranks true mates") {
    val emb = fixture
    val coarse = Similarity.ivfFit(emb, "truth", "embedding")
    val pq = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 3, iters = 3)
    val res = Similarity.ivfPqKnn(emb, emb.filter(col("vec_id") < 3), "vec_id",
        "embedding", clusterCol = "truth", k = 2, nprobe = 1,
        coarse = coarse, pq = pq)
      .join(emb.select(col("vec_id").as("query_id"), col("truth").as("qt")), Seq("query_id"))
      .collect()
    assert(res.length == 6, s"3 queries × k=2: ${res.length}")
    res.foreach { r =>
      assert(r.getAs[Int]("cluster") == r.getAs[Int]("qt"),
        s"nprobe=1 must only surface the query's own coarse cluster: $r")
    }
  }

  test("semanticDedupPairs finds exactly the within-cluster pairs on separated data") {
    val emb = fixture
    val idx = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 3, iters = 3)
    val got = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
        threshold = 0.9, index = idx, nprobe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Ground truth: jitter is ±0.2 on ±10 coordinates, so cluster-mates
    // sit at cosine ≈ 1 and cross-cluster pairs far below 0.9 — the
    // expected set is exactly the same-truth pairs.
    val truth = fixture.select("vec_id", "truth").as[(Long, Int)].collect()
    val expect = (for {
      (a, ta) <- truth; (b, tb) <- truth if a < b && ta == tb
    } yield (a, b)).toSet
    assert(expect.size == 45, "3 clusters × C(6,2)")
    assert(got == expect, s"missing ${expect -- got}, extra ${got -- expect}")
  }

  test("pqSave/pqLoad round-trips: the loaded index encodes bit-identically") {
    val emb = fixture
    val idx = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 3, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_store").toString
    Similarity.pqSave(spark, idx, dir)
    val loaded = Similarity.pqLoad(spark, dir)
    assert(loaded.subDim == idx.subDim && loaded.m == idx.m)
    val a = Similarity.pqEncode(emb, "vec_id", "embedding", idx)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    val b = Similarity.pqEncode(emb, "vec_id", "embedding", loaded)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "loaded quantizer must encode identically")
  }

  test("hardNegatives excludes the duplicate band before ranking") {
    val emb = fixture
    // dupThreshold 0.9: cluster-mates (cosine ≈ 1) are excluded, so every
    // returned negative comes from a DIFFERENT cluster.
    val got = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", k = 3, dupThreshold = 0.9)
      .join(emb.select(col("vec_id").as("cand_id"), col("truth").as("ct")), Seq("cand_id"))
      .join(emb.select(col("vec_id").as("query_id"), col("truth").as("qt")), Seq("query_id"))
      .collect()
    assert(got.length == 9, s"3 queries × k=3: ${got.length}")
    got.foreach { r =>
      assert(r.getAs[Int]("ct") != r.getAs[Int]("qt"),
        s"negatives must come from outside the anchor's cluster: $r")
    }
  }

  test("malformed candidates rank last in ADC, never displacing real neighbors") {
    // A wrong-dimension vector gets null codes (its distance table is
    // all-null); its ADC distance must be NaN — GREATER than every real
    // distance under Spark ordering — not null, which ascending rank
    // would put FIRST.
    val emb = fixture
    val idx = Similarity.pqFit(emb, "vec_id", "embedding", m = 2, k = 3, iters = 2)
    val malformed = Seq((99L, Seq(1f, 2f))).toDF("vec_id", "embedding") // 2-dim vs 8
    val corpus = emb.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
      .unionByName(malformed.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding")))
    val got = Similarity.pqAdcKnn(corpus, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = corpus.count().toInt, index = idx)
      .select("cand_id", "adc_d2", "rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val worst = got.maxBy(_._3)
    assert(worst._1 == 99L && worst._2.isNaN,
      s"the malformed candidate must rank last with NaN distance: ${worst}")
    assert(got.filter(_._1 != 99L).forall(t => !t._2.isNaN))
  }

  test("zero-norm vectors still receive a cluster under dense assignment") {
    val emb = fixture.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((99L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")))
    val idx = Similarity.kmeansFit(fixture, "vec_id", "embedding", k = 3, iters = 2)
    val got = Similarity.ivfAssign(emb, "vec_id", "embedding", idx)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    // All-null cosine scores fall back to the smallest label — the row
    // stays routable instead of vanishing from every downstream equi-join.
    assert(got(99L) != null, "zero-norm row must not get a NULL cluster")
    assert(got(99L) == idx.centroids.map(c => c.label.asInstanceOf[Int]).min)
  }

  test("pqFit survives k > distinct vectors (empty-cluster collapse)") {
    val emb = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f)), (3L, Seq(5f, 6f)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.pqFit(emb, "vec_id", "embedding", m = 1, k = 3, iters = 2)
    assert(idx.codebooks.head.nonEmpty && idx.codebooks.head.size <= 3)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", idx).collect()
    assert(enc.length == 3)
  }
}
