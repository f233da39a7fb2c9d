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
}
