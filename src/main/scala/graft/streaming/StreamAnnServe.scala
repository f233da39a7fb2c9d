package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.functions.VectorFunctions._
import graft.ops.Similarity
import graft.ops.Similarity.IvfIndex

/** Streaming ANN serving — the online face of the batch IVF stack: a
  * stream of query vectors probes a PRE-FITTED index against a static,
  * cluster-keyed store, as pure Structured Streaming (no foreachBatch).
  *
  * The pipeline per micro-batch:
  *
  *   1. cluster routing is MAP-SIDE ([[Similarity.probeClusters]] — the
  *      centroids are plan-time literals, zero shuffle for assignment);
  *   2. candidates come from a stream-static equi join on the cluster
  *      key, so each query touches only its `nprobe` clusters' slice of
  *      the store (partition-prune the store by `cluster` on disk and
  *      the scan skips the rest, same as the batch `ann_ivfpq_pruned`
  *      path);
  *   3. top-k folds through the [[TopKAgg]] typed aggregate in UPDATE
  *      mode — streaming state is k (id, score) pairs per query key,
  *      never the candidate set; a query whose clusters straddle two
  *      micro-batches (store growth between triggers) refines its
  *      result instead of duplicating it.
  *
  * State contract: keyed aggregation state lives per query_id. Serving
  * queries are one-shot keys, so production bounds state by watermarking
  * the query stream's event time upstream (evicting answered queries);
  * the spec drives the unwatermarked form and asserts parity with the
  * batch [[Similarity.ivfKnn]] on the same store.
  */
object StreamAnnServe {

  /** Scored candidates for each streamed query — stages 1–2 (map-side
    * probe + stream-static join), before any aggregation. Exposed so
    * callers that only need the candidate stream (e.g. a re-ranker)
    * skip the top-k state entirely.
    */
  def scoredCandidates(queries: DataFrame, store: DataFrame,
                       index: IvfIndex, idCol: String, vecCol: String,
                       clusterCol: String, nprobe: Int): DataFrame = {
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        normD(col(vecCol)).as("__qn"))
      .withColumn("cluster",
        explode(Similarity.probeClusters(col("__qv"), col("__qn"),
          index, nprobe)))
    val c = store.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      normD(col(vecCol)).as("__cn"), col(clusterCol).as("cluster"))
    q.join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cluster"), col("cand_id"),
        round(dotD(col("__qv"), col("__cv")) /
          nullif(col("__qn") * col("__cn"), lit(0.0)), 6).as("cosine"))
  }

  /** Full serving pipeline: top-k per query over [[scoredCandidates]],
    * flattened to (query_id, cand_id, cosine, rn). Run with
    * `outputMode("update")`; ties break to the lowest candidate id (the
    * [[TopKAgg]] contract, identical to the batch kNN gates).
    */
  def serve(queries: DataFrame, store: DataFrame, index: IvfIndex,
            idCol: String, vecCol: String, clusterCol: String,
            k: Int, nprobe: Int = 1): DataFrame = {
    val topk = udaf(TopKAgg(k))
    scoredCandidates(queries, store, index, idCol, vecCol, clusterCol, nprobe)
      .groupBy(col("query_id"))
      .agg(topk(col("cand_id"), col("cosine")).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e._1").as("cand_id"),
        col("__e._2").as("cosine"), (col("__pos") + 1).cast("int").as("rn"))
  }

  /** The FULL serve stack in streaming form (L295 / round-13 verdict #7):
    * IVF coarse routing (map-side probe, stream-static cluster equi-join)
    * → prefix-truncated CANDIDATE ranking → full-dimension re-rank to
    * top-k — matching the gated batch
    * [[Similarity.ivfTruncatedRerankKnn]] answer exactly (same rounding,
    * same (pcos desc, id) candidate cut, same (fcos desc, id) final
    * order).
    *
    * Single stateful operator: [[graft.functions.TopKRerankAgg]] keeps
    * the top `candidates` (id, prefix_cos, full_cos) triples per query —
    * state is the CANDIDATE BUDGET, never the scored set — and its
    * finish re-ranks survivors by the full metric. Chaining a second
    * aggregation or a post-aggregation store join (the literal batch
    * shape) is a multi-stateful-operator pattern streaming restricts;
    * instead the full-dim cosine rides along as payload, computed during
    * the candidate scan — in streaming the probed store slice is being
    * read per micro-batch anyway, so the batch stack's deferred-flops
    * argument (don't full-score a corpus you'll mostly discard) doesn't
    * apply to the slice.
    */
  def serveTruncatedRerank(queries: DataFrame, store: DataFrame,
                           index: IvfIndex, idCol: String, vecCol: String,
                           clusterCol: String, k: Int, nprobe: Int,
                           prefixDims: Int, candidates: Int): DataFrame = {
    require(candidates >= k, "candidate budget must cover k")
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qf"),
        slice(col(vecCol), 1, prefixDims).as("__qp"))
      .withColumn("__qfn", normD(col("__qf")))
      .withColumn("__qpn", normD(col("__qp")))
      .withColumn("cluster",
        explode(Similarity.probeClusters(col("__qf"), col("__qfn"),
          index, nprobe)))
    val c = store
      .select(col(idCol).as("cand_id"), col(vecCol).as("__cf"),
        slice(col(vecCol), 1, prefixDims).as("__cp"),
        col(clusterCol).as("cluster"))
      .withColumn("__cfn", normD(col("__cf")))
      .withColumn("__cpn", normD(col("__cp")))
    val topr = udaf(graft.functions.TopKRerankAgg(k, candidates))
    q.join(c, Seq("cluster"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(dotD(col("__qp"), col("__cp")) /
          nullif(col("__qpn") * col("__cpn"), lit(0.0)), 6).as("pcos"),
        round(dotD(col("__qf"), col("__cf")) /
          nullif(col("__qfn") * col("__cfn"), lit(0.0)), 6).as("fcos"))
      .groupBy(col("query_id"))
      .agg(topr(col("cand_id"), col("pcos"), col("fcos")).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e._1").as("cand_id"),
        col("__e._2").as("cosine"), (col("__pos") + 1).cast("int").as("rn"))
  }
}
