package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceKnn]]: exact cosine top-k. The QUERY side broadcasts
  *     (small set of probe vectors); the corpus streams through — at 100 TB
  *     this is one scan, no shuffle of the corpus, and the per-query top-k
  *     is a windowed rank over (query, candidate) scores whose cardinality
  *     is |queries| × |corpus| — use only when |queries| is small.
  *   - [[lshKnn]]: signed-random-projection LSH. Bucket ids are computed
  *     map-side from deterministic md5-derived hyperplanes; the join is an
  *     equi-join on the bucket, so each query scores only its bucket's
  *     candidates (recall < 1, tunable by `planes`; multi-probe = union
  *     over neighboring buckets would be the next step).
  *
  * Ranking is by cosine ROUNDED to 6 decimals with id tie-break, making
  * top-k deterministic and portable across engines.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Both frames must expose (`idCol`, `vecCol`).
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    // Norms are hoisted to one pass per side; each pair then costs a single
    // array fold (dot) instead of three.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      normD(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      normD(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        round(dotD(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rn"))
  }

  /** LSH-bucketed cosine top-k: candidates limited to the query's bucket.
    * `dims` = embedding length (hyperplane coefficients are plan-time
    * literals, see VectorFunctions.planeCoeffValue).
    *
    * Recall note: signed-random-projection recall depends on the corpus
    * having angular structure; on isotropic random vectors single-probe
    * recall@k is low by nature (measured 0.10 on the synthetic testdata via
    * [[recallAtK]]) — use [[lshKnnMultiProbe]] and/or more planes+probes,
    * and track the recall harness when tuning.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      normD(col(vecCol)).as("__qn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      normD(col(vecCol)).as("__cn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        round(dotD(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"), col("cosine"), col("rn"))
  }

  /** Multi-probe LSH kNN: each query probes its own bucket PLUS every
    * bucket at Hamming distance 1 (one flipped hyperplane) — the standard
    * recall boost without adding planes. The probe set explodes on the
    * (small) query side into `planes`+1 rows, so the corpus join stays a
    * bucket equi-join.
    */
  def lshKnnMultiProbe(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int, planes: Int,
                       dims: Int): DataFrame = {
    val probes = array((0 to planes).map {
      case 0 => col("__home")
      case p => col("__home").bitwiseXOR(lit(1L << (p - 1)))
    }: _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      normD(col(vecCol)).as("__qn"),
      lshBucket(col(vecCol), planes, dims).as("__home"))
      .withColumn("bucket", explode(probes))
      .drop("__home")
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      normD(col(vecCol)).as("__cn"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dotD(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6)
          .as("cosine"))
      .distinct() // a candidate can appear via several probes
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Recall@k of an ANN result against brute-force ground truth: the
    * fraction of each query's true top-k the ANN result recovered —
    * the evaluation harness that turns "approximate" into a number.
    * Both inputs must expose (query_id, cand_id, rn ≤ k).
    */
  def recallAtK(ann: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val t = truth.filter(col("rn") <= k).select(col("query_id"), col("cand_id"))
    val a = ann.filter(col("rn") <= k).select(col("query_id"), col("cand_id"))
    t.join(a, Seq("query_id", "cand_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
      .join(t.groupBy(col("query_id")).agg(count(lit(1)).as("truth_k")),
        Seq("query_id"), "right")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("truth_k"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("truth_k"), 6)
          .as("recall"))
  }

  /** IVF-style ANN: coarse quantization by an existing cluster column —
    * centroids are the per-cluster component-wise means; each query probes
    * ONLY its nearest centroid's cluster (nprobe=1). At 100 TB the corpus
    * is read cluster-pruned (centroids broadcast, cluster column
    * partition-prunable); recall improves by probing more clusters.
    * Centroid components are rounded to 6 decimals so assignment is
    * deterministic across engines.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, clusterCol: String, k: Int): DataFrame = {
    val comp = corpus.select(col(clusterCol), posexplode(col(vecCol)))
      .groupBy(col(clusterCol), col("pos"))
      .agg(avg(col("col").cast("double")).as("c"))
    val centroids = comp.groupBy(col(clusterCol))
      .agg(array_sort(collect_list(struct(col("pos"), round(col("c"), 6).as("c"))))
        .as("__s"))
      .select(col(clusterCol).as("__clabel"),
        transform(col("__s"), s => s.getField("c")).as("__centroid"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wAssign = Window.partitionBy(col("query_id"))
      .orderBy(col("__ccos").desc, col("__clabel"))
    val assigned = q.crossJoin(broadcast(centroids))
      .withColumn("__ccos", round(cosine(col("__qv"), col("__centroid")), 6))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__qv"), col("__clabel").as("cluster"))

    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      normD(col(vecCol)).as("__cn"), col(clusterCol).as("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    c.join(broadcast(assigned.withColumn("__qn", normD(col("__qv")))), Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        round(dotD(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cluster"), col("cand_id"), col("cosine"), col("rn"))
  }

  /** Embedding-cosine near-duplicate mining (the 5th dedup modality): pairs
    * whose cosine ≥ `threshold`, candidate-limited to LSH co-bucketed
    * vectors — the corpus is never self-joined at large, only within
    * buckets. Recall is tunable via `planes` (fewer planes → bigger buckets
    * → higher recall, more work).
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, planes: Int, dims: Int): DataFrame = {
    val withBucket = emb.select(col(idCol), col(vecCol),
      normD(col(vecCol)).as("__n"),
      lshBucket(col(vecCol), planes, dims).as("bucket")).cache()
    val a = withBucket.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("__n").as("__na"), col("bucket"))
    val b = withBucket.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("__n").as("__nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dotD(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("bucket"), col("cosine"))
  }

  /** Per-label norm statistics (sanity profile of an embedding corpus). */
  def normStats(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb.select(col(labelCol), normD(col(vecCol)).as("__n"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("__n")), 6).as("avg_norm"),
        round(min(col("__n")), 6).as("min_norm"),
        round(max(col("__n")), 6).as("max_norm"))
}
