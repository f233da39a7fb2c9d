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
