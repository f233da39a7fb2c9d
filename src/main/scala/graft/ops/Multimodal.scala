package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run PARTITION-WISE over batched rows
  * (`mapPartitions` — the Scala analog of `mapInPandas` batch processing:
  * the decode library is loaded once per partition, rows stream through).
  *
  * The actual codec calls are STUBBED (`decodeStub`): no image/audio
  * libraries exist in this environment. The stub is a deterministic pure
  * function of the payload bytes so pipelines are testable end-to-end; the
  * Spark-side contract — schema, batch shape, partition-wise execution,
  * null handling — is real and is what a codec swap-in would inherit.
  */
object Multimodal {

  /** Canonical media row: id + payload + envelope metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType)))

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** STUB decode: deterministic fake dimensions from payload size. A real
    * deployment replaces ONLY this function with a codec call (e.g. JPEG
    * header parse); everything else in the pipeline is unchanged.
    */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (64 + (n % 512), 64 + ((n / 7) % 512), 3)
  }

  /** Partition-wise image metadata extraction over (media_id, payload). */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val out = media.select(col("media_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        // Per-partition setup happens HERE once (codec init in real life).
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Row(id, 0L, null, null, null)
          else {
            val (w, h, c) = decodeStub(payload)
            Row(id, payload.length.toLong, w, h, c)
          }
        }
      }(Encoders.row(imageMetaSchema))
    out
  }

  /** Byte-range chunking with overlap — the training-prep op for long
    * payloads (audio windows, long-text blocks): chunk boundaries are pure
    * metadata arithmetic (no decode), the slice is a `substring` on the
    * binary column, and overlap (`chunkBytes − stride`) preserves context
    * across boundaries. One explode, no shuffle; empty payloads yield one
    * empty chunk so every media row survives into the chunk table.
    */
  def chunk(media: DataFrame, chunkBytes: Int, overlapBytes: Int = 0): DataFrame = {
    require(overlapBytes >= 0 && overlapBytes < chunkBytes,
      "overlap must be smaller than the chunk size")
    val stride = (chunkBytes - overlapBytes).toLong
    media
      .withColumn("__n", length(col("payload")).cast("long"))
      .withColumn("chunk_start",
        explode(sequence(lit(0L), greatest(col("__n"), lit(1L)) - 1, lit(stride))))
      .withColumn("chunk_idx", (col("chunk_start") / stride).cast("int"))
      .withColumn("chunk_len",
        least(lit(chunkBytes.toLong), col("__n") - col("chunk_start")))
      .withColumn("chunk",
        expr(s"substring(payload, CAST(chunk_start + 1 AS INT), $chunkBytes)"))
      .select(col("media_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"), col("chunk"))
  }

  /** Frame sampling plan for a "video" payload: one output row per sampled
    * frame index — the explode happens WITHOUT decoding (indices derive from
    * metadata), so the heavy decode can be deferred/filtered downstream.
    */
  def frameSample(media: DataFrame, fps: Int, everyNthFrame: Int): DataFrame =
    media
      .withColumn("n_frames",
        (length(col("payload")).cast("long") % 1000 + 1).cast("int")) // stub: frames from size
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNthFrame))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx").cast("double") / fps).as("ts_sec"))
}
