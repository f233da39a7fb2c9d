package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the streaming face of [[graft.ops.Dedup.exact]]
  * for training-data pipelines that ingest continuously: duplicates
  * arriving within the event-time watermark horizon are dropped with
  * BOUNDED state (`dropDuplicatesWithinWatermark` evicts keys once the
  * watermark passes them). Plain `dropDuplicates` on a stream would grow
  * state forever; batch re-dedup of the sink catches the rare
  * beyond-horizon stragglers.
  */
object StreamDedup {

  /** Drop rows whose key columns repeat within the watermark window. */
  def exactWithinWatermark(stream: DataFrame, tsCol: String,
                           keyCols: Seq[String], watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Content-hash key for text payloads: md5 computed map-side so dedup
    * state stores 32-char hashes, not document bodies.
    */
  def withContentHash(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("content_hash", md5(col(textCol)))

  /** Novelty gate against a STATIC fingerprint store — the streaming face
    * of [[graft.ops.Dedup.incrementalPairs]]' exact tier: each micro-batch
    * anti-joins the accumulated corpus store (a parquet table of content
    * hashes), so only never-seen documents pass. The store re-reads per
    * batch (stream-static join semantics) — at scale keep it as a compact
    * hash-only table, optionally bucketed by the hash for a shuffle-free
    * probe; pair with [[exactWithinWatermark]] upstream for within-stream
    * duplicates the store hasn't absorbed yet.
    */
  def novelAgainstStore(stream: DataFrame, store: DataFrame,
                        keyCols: Seq[String]): DataFrame =
    stream.join(store, keyCols, "left_anti")

  /** Streaming soft dedup — the micro-batch counterpart of the batch
    * 1/|cluster| down-weighting (`sample_soft_dedup`): newly ingested
    * near-dups are folded into the accumulated cluster store instead of
    * the whole corpus being re-mined. Call from `foreachBatch` with the
    * current store `(idCol, cluster_id, textCol)`; returns the UPDATED
    * store (write it back, then derive weights via [[softWeights]]).
    *
    * Per batch: (1) new×store near-dup edges via
    * [[graft.ops.Dedup.incrementalPairs]], each rewritten to the store
    * doc's CLUSTER id (cluster ids are min-member doc ids, so clusters
    * are valid union-find nodes); (2) new×new edges via
    * [[graft.ops.Dedup.nearDuplicates]] on the batch alone; (3) one
    * connected-components pass over that batch-sized edge graph (driver
    * union-find under [[graft.ops.Dedup]]'s bounded probe — the graph is
    * O(batch), never O(corpus)); (4) relabel: new docs adopt their
    * component, store clusters BRIDGED by a new doc merge to the
    * component minimum. Min labels propagate exactly as a batch
    * recompute would, so after any batch split the store's components
    * equal `Dedup.clusters(nearDuplicates(corpus))` on everything
    * ingested so far — the spec pins this parity. Scale: the store
    * re-reads per batch (stream-static semantics); the only corpus-sized
    * work is incrementalPairs' shingle probe, which is df-capped.
    *
    * `maxDocFrequency` caveat: the df cap sees the CORPUS AT INGEST TIME,
    * so a capped run can admit an edge a batch backfill would cap away
    * (or vice versa) near the threshold — exact parity needs
    * `maxDocFrequency = None` (the spec's setting) or a stable hot set.
    *
    * Candidate-recall caveat: cross-batch edges are EXACT
    * (incrementalPairs' shingle equi-join) while within-batch and
    * batch-backfill edges are planner-banded LSH, whose collision
    * S-curve crosses ~0.5 AT the threshold itself — so a true pair
    * sitting just above `minJaccard` can be found by the incremental
    * path and missed by a backfill (streaming edges are always a
    * SUPERSET; more perms sharpen the curve around t, they do not move
    * it). Exact parity therefore holds when the corpus's true pairs sit
    * well above the threshold — the spec fixtures mine at t far enough
    * below their pair similarities that candidate recall saturates.
    * `nPerms` is the sharpness/cost lever, passed through to
    * [[graft.ops.Dedup.nearDuplicates]].
    */
  def softDedupIngest(store: DataFrame, batch: DataFrame, idCol: String,
                      textCol: String, minJaccard: Double, n: Int = 3,
                      maxDocFrequency: Option[Double] = Some(0.1),
                      nPerms: Int = 16): DataFrame = {
    import graft.ops.Dedup
    val newDocs = batch.select(col(idCol), col(textCol))
    val crossEdges = Dedup.incrementalPairs(
        newDocs, store.select(col(idCol), col(textCol)), idCol, textCol,
        minJaccard, n, maxDocFrequency)
      .join(store.select(col(idCol).as("corpus_id"), col("cluster_id")),
        Seq("corpus_id"))
      .select(col("new_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val withinEdges = Dedup.nearDuplicates(newDocs, idCol, textCol, minJaccard,
        n = n, maxDocFrequency = maxDocFrequency, nPerms = nPerms)
      .select(col("doc_a"), col("doc_b"))
    val comp = Dedup.clusters(crossEdges.unionByName(withinEdges))
    val newAssigned = newDocs
      .join(comp.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"), col(textCol))
    val storeRelabeled = store
      .join(comp.select(col("doc_id").as("cluster_id"),
        col("cluster_id").as("__merged")), Seq("cluster_id"), "left")
      .select(col(idCol),
        coalesce(col("__merged"), col("cluster_id")).as("cluster_id"),
        col(textCol))
    storeRelabeled.unionByName(newAssigned)
  }

  /** [[softDedupIngest]] against a PRE-SHINGLED store: the cross-batch
    * near-dup probe reads an accumulated `(idCol, shingle)` table instead
    * of re-tokenizing every stored document body each batch — the
    * production shape for continuous ingest (append
    * `Dedup.shingleSets(batch)` to the shingle store after each call;
    * at cluster scale bucket it by `shingle` for a shuffle-free probe).
    * Cluster semantics identical to [[softDedupIngest]].
    */
  def softDedupIngestPreShingled(store: DataFrame, storeShingles: DataFrame,
                                 batch: DataFrame, idCol: String,
                                 textCol: String, minJaccard: Double,
                                 n: Int = 3,
                                 maxDocFrequency: Option[Double] = Some(0.1),
                                 nPerms: Int = 16): DataFrame = {
    import graft.ops.Dedup
    val newDocs = batch.select(col(idCol), col(textCol))
    val crossEdges = Dedup.incrementalPairsPreShingled(
        newDocs, storeShingles, idCol, textCol, minJaccard, n, maxDocFrequency)
      .join(store.select(col(idCol).as("corpus_id"), col("cluster_id")),
        Seq("corpus_id"))
      .select(col("new_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val withinEdges = Dedup.nearDuplicates(newDocs, idCol, textCol, minJaccard,
        n = n, maxDocFrequency = maxDocFrequency, nPerms = nPerms)
      .select(col("doc_a"), col("doc_b"))
    val comp = Dedup.clusters(crossEdges.unionByName(withinEdges))
    val newAssigned = newDocs
      .join(comp.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"), col(textCol))
    val storeRelabeled = store
      .join(comp.select(col("doc_id").as("cluster_id"),
        col("cluster_id").as("__merged")), Seq("cluster_id"), "left")
      .select(col(idCol),
        coalesce(col("__merged"), col("cluster_id")).as("cluster_id"),
        col(textCol))
    storeRelabeled.unionByName(newAssigned)
  }

  /** 1/|cluster| down-weights from a soft-dedup store — identical output
    * contract to the batch `sample_soft_dedup` gate. No broadcast hint:
    * the cluster-size frame is O(store) in the worst case (see
    * [[graft.ops.Dedup.survivors]]); AQE broadcasts it when small.
    */
  def softWeights(store: DataFrame, idCol: String): DataFrame = {
    val sizes = store.groupBy(col("cluster_id")).agg(count(lit(1)).as("__csz"))
    store.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"),
        round(lit(1.0) / col("__csz"), 6).as("weight"))
  }

  /** SimHash key for NEAR-dup streaming dedup: the signature is invariant
    * to token order and collapses token-multiset-identical documents
    * (shuffled boilerplate, reordered lists) that content-hash dedup
    * misses. Dedup on the signature within the watermark drops those with
    * the same bounded state as [[exactWithinWatermark]]; state stores one
    * long per doc. (Hamming-NEIGHBOR matching needs the pigeonhole band
    * join — that is the batch [[graft.ops.Dedup.simhashPairs]]; a
    * streaming variant would key state by band chunks.)
    */
  def withSimhash(stream: DataFrame, idCol: String, textCol: String,
                  bits: Int = 16): DataFrame = {
    import graft.functions.TextFunctions._
    // Inline map-side simhash (mirrors Dedup.simhash's definition: bit b
    // set when the ±1 vote sum over token bit b is >= 0), expressed on the
    // token ARRAY per row so it composes into a streaming projection
    // without a groupBy.
    val ws = words(col(textCol))
    val bitCols: Seq[org.apache.spark.sql.Column] = (0 until bits).map { b =>
      val votes = aggregate(ws, lit(0L),
        (acc, w) => acc + (shiftright(wordCode16(w), b) % 2) * 2 - 1)
      when(votes >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    stream.withColumn("simhash", bitCols.reduce(_ + _))
  }
}
