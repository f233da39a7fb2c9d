package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the LM-training prep step that concatenates documents
  * into fixed-token-budget training sequences (so short docs don't waste
  * context window as padding).
  *
  * Deterministic streaming concatenation, the standard large-corpus shape:
  * documents are ordered by a stable key hash (reproducible "shuffle"),
  * laid end-to-end, and cut every `seqTokens` tokens. Each doc's placement
  * derives from the running token count BEFORE it: seq_id = offset /
  * seqTokens, and a doc straddles a cut iff its span crosses a multiple of
  * seqTokens (the trainer masks or splits at that point).
  *
  * Scale design: a single global running sum would serialize the corpus
  * through one ordered partition. Instead docs are first assigned to
  * `nShards` shards by key hash (uniform, deterministic), and the
  * cumulative sum runs PER SHARD — `nShards` independent window pipelines,
  * one exchange keyed by shard, each shard packing its own sequence space.
  * Sequence ids are globally unique via (shard, seq_in_shard).
  */
object Packing {

  /** @param tokenCol precomputed per-doc token count (see
    *                 [[TextAnalysis.tokenCounts]])
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    seqTokens: Int, nShards: Int): DataFrame = {
    require(seqTokens > 0 && nShards > 0, "seqTokens and nShards must be positive")
    val shard = pmod(graft.functions.HashExpressions.md5HexLong(
      col(idCol).cast("string"), 1, 8), lit(nShards.toLong)).cast("int")
    // Order within a shard by the SAME hash (stable, engine-portable),
    // id tie-break for exact determinism.
    val orderKey = graft.functions.HashExpressions.md5HexLong(
      col(idCol).cast("string"), 9, 8)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(tokenCol), shard.as("shard"), orderKey.as("__ord"))
      .withColumn("offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // integral div (not `/`, which is double division in Spark SQL)
      .withColumn("seq_in_shard", expr(s"offset DIV $seqTokens"))
      .withColumn("pos_in_seq", col("offset") % seqTokens)
      .withColumn("straddles",
        (col("pos_in_seq") + col(tokenCol)) > lit(seqTokens.toLong))
      .select(col(idCol), col("shard"), col("offset"), col("seq_in_shard"),
        col("pos_in_seq"), col("straddles"))
  }

  /** Deterministic training-order manifest: every document gets a
    * (shard, position) — a reproducible global "shuffle" with NO global
    * sort. Shard assignment and within-shard order both derive from
    * independent md5 substrings of the id (same keys as [[packSequences]],
    * so a manifest and a packing of the same corpus agree on order);
    * positions are per-shard `row_number`s — `nShards` independent window
    * pipelines over one exchange, each shard's order decided without
    * seeing the others. This is the op a trainer's data loader consumes:
    * epoch N's order is `(shard, pos)` with a per-epoch salt on the hash.
    */
  def shardManifest(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val shard = pmod(graft.functions.HashExpressions.md5HexLong(
      col(idCol).cast("string"), 1, 8), lit(nShards.toLong)).cast("int")
    val orderKey = graft.functions.HashExpressions.md5HexLong(
      col(idCol).cast("string"), 9, 8)
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    docs.select(col(idCol), shard.as("shard"), orderKey.as("__ord"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Padding-waste report: what fraction of the training batch is pad
    * tokens under (a) naive fixed-length batching (every sequence padded
    * to `maxLen`) vs (b) length-bucketed batching (padded to the doc's
    * bucket upper bound, buckets of `bucket` tokens) — the measurement
    * that justifies length bucketing in a training pipeline. Docs longer
    * than `maxLen` are counted as truncated to it (they pad nothing).
    * One aggregation; all arithmetic integral until the final ratios.
    */
  def paddingReport(docs: DataFrame, tokenCol: String,
                    maxLen: Int, bucket: Int): DataFrame = {
    require(bucket > 0 && maxLen % bucket == 0,
      "bucket must divide maxLen")
    val capped = least(col(tokenCol).cast("long"), lit(maxLen.toLong))
    // Bucket upper bound via integral arithmetic; empty docs land in the
    // first bucket (they still occupy a padded slot).
    val ub = greatest(
      expr(s"((__capped + ${bucket - 1}) DIV $bucket) * $bucket"),
      lit(bucket.toLong))
    docs.select(capped.as("__capped"))
      .select(ub.as("bucket_ub"), col("__capped"))
      .groupBy(col("bucket_ub"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__capped")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket_ub"))
      .withColumn("naive_tokens", col("n_docs") * lit(maxLen.toLong))
      .withColumn("waste",
        round(lit(1.0) - col("sum_tokens").cast("double") / col("padded_tokens"), 6))
      .withColumn("naive_waste",
        round(lit(1.0) - col("sum_tokens").cast("double") / col("naive_tokens"), 6))
  }

  /** T5-style span-corruption example generation, deterministic: each
    * document's tokens split into `blockLen`-token blocks; block b of
    * doc d is masked iff the md5-uniform of (d, b) < `maskProb` (the
    * keyed-hash sampling doctrine — reproducible on any engine at any
    * partitioning, unlike RNG masking). The k-th masked block is
    * replaced by the sentinel `<extra_id_k>` in the INPUT and emitted as
    * `<extra_id_k> tokens…` in the TARGET — the standard denoising
    * pretraining pair.
    *
    * Entirely MAP-SIDE: blocks, mask decisions, sentinel numbering, and
    * both assemblies are array lambdas over the row's own tokens — no
    * explode, no shuffle, no state. Sentinel numbering recomputes the
    * mask hash for the preceding blocks (O(blocks²) per doc with tiny
    * constants) rather than carrying a prefix-count struct — blocks per
    * doc is context-window bounded.
    *
    * Output: (idCol, n_blocks, n_masked, input_text, target_text).
    * Token-less docs emit 0 blocks and empty strings.
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     blockLen: Int, maskProb: Double): DataFrame = {
    require(blockLen > 0, "blockLen must be positive")
    require(maskProb > 0.0 && maskProb < 1.0, "maskProb must lie in (0, 1)")
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.Column
    val ws = words(col(textCol))
    val nTok = size(ws)
    // Ceil-div in exact arithmetic (Column `/` is double division; the
    // floor+cast is exact far beyond any real token count).
    val nBlocks = floor((nTok + lit(blockLen - 1)) / lit(blockLen)).cast("int")
    def maskedAt(b: Column): Column =
      graft.functions.HashExpressions.md5HexLong(
        concat(col(idCol).cast("string"), lit(":"), b.cast("string")), 1, 8)
        .cast("double") / lit(4294967296.0) < lit(maskProb)
    def sentinelNo(b: Column): Column =
      when(b > 0,
        size(filter(sequence(lit(0), b - 1), bb => maskedAt(bb))))
        .otherwise(lit(0))
    def blockText(b: Column): Column =
      array_join(slice(ws, b * blockLen + 1, lit(blockLen)), " ")
    val blockIdx = when(nTok > 0,
      sequence(lit(0), nBlocks - 1)).otherwise(array().cast("array<int>"))
    val inputText = array_join(
      transform(blockIdx, b =>
        when(maskedAt(b),
          concat(lit("<extra_id_"), sentinelNo(b).cast("string"), lit(">")))
          .otherwise(blockText(b))), " ")
    val targetText = array_join(
      transform(filter(blockIdx, b => maskedAt(b)), b =>
        concat(lit("<extra_id_"), sentinelNo(b).cast("string"), lit("> "),
          blockText(b))), " ")
    docs.select(col(idCol),
      when(nTok > 0, nBlocks).otherwise(lit(0)).cast("long").as("n_blocks"),
      size(filter(blockIdx, b => maskedAt(b))).cast("long").as("n_masked"),
      inputText.as("input_text"),
      targetText.as("target_text"))
  }
}
