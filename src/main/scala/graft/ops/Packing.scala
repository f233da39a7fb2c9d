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
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong)).cast("int")
    // Order within a shard by the SAME hash (stable, engine-portable),
    // id tie-break for exact determinism.
    val orderKey = conv(substring(md5(col(idCol).cast("string")), 9, 8), 16, 10)
      .cast("long")
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
}
