package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** Media payload introspection as native Catalyst expressions.
  *
  * [[ImageHeader]] lifts [[graft.ops.Multimodal.parseImageHeader]]'s pure
  * byte arithmetic (JPEG SOFn segment walk / PNG IHDR chunk, see the
  * layout notes there) out of a `mapPartitions` boundary and into the
  * expression layer: null handling comes from `UnaryExpression`, the
  * expression participates in Catalyst (folding, pruning), and — unlike
  * the `mapPartitions` form — it does not force an
  * object-serialization boundary into the surrounding plan, so adjacent
  * projections stay inside whole-stage codegen (the expression itself is
  * `CodegenFallback`: one virtual call per row, like `DeflateSize`).
  * Header parsing needs no per-partition codec state, so nothing is lost
  * over the partition-wise form; a real pixel DECODER (heavy native
  * library, batch-amortized init) would still belong in `mapPartitions`.
  */
object MediaFunctions {

  private val headerType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    // distinguishes "corrupt image" (magic bytes present, dims null) from
    // "not an image at all" — callers route the latter to their stub.
    StructField("is_image", BooleanType, nullable = false)))

  case class ImageHeader(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = headerType
    override def prettyName: String = "image_header"

    override protected def nullSafeEval(input: Any): Any = {
      val p = input.asInstanceOf[Array[Byte]]
      graft.ops.Multimodal.parseImageHeader(p) match {
        case Some((w, h, c)) =>
          new GenericInternalRow(Array[Any](w, h, c, true))
        case None =>
          new GenericInternalRow(
            Array[Any](null, null, null, graft.ops.Multimodal.looksLikeImage(p)))
      }
    }

    override protected def withNewChildInternal(newChild: Expression): ImageHeader =
      copy(child = newChild)
  }

  /** struct(width, height, channels, is_image) of a binary payload; null
    * for a null payload. Dims are null when the payload is corrupt
    * (`is_image` true) or not an image (`is_image` false).
    */
  def imageHeader(payload: Column): Column =
    CatalystBridge.column(ImageHeader(CatalystBridge.expression(payload)))

  private val audioHeaderType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("block_align", IntegerType),
    StructField("data_bytes", LongType),
    StructField("is_audio", BooleanType, nullable = false)))

  /** WAV/RIFF counterpart of [[ImageHeader]]: lifts
    * [[graft.ops.Multimodal.parseWavHeader]]'s little-endian chunk walk
    * into the expression layer (same codegen story — `CodegenFallback`,
    * one virtual call per row, adjacent projections stay fused).
    */
  case class AudioHeader(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = audioHeaderType
    override def prettyName: String = "audio_header"

    override protected def nullSafeEval(input: Any): Any = {
      val p = input.asInstanceOf[Array[Byte]]
      graft.ops.Multimodal.parseWavHeader(p) match {
        case Some((ch, rate, bits, ba, dataBytes)) =>
          new GenericInternalRow(Array[Any](ch, rate, bits, ba, dataBytes, true))
        case None =>
          new GenericInternalRow(Array[Any](
            null, null, null, null, null, graft.ops.Multimodal.looksLikeWav(p)))
      }
    }

    override protected def withNewChildInternal(newChild: Expression): AudioHeader =
      copy(child = newChild)
  }

  /** struct(channels, sample_rate, bits, block_align, data_bytes, is_audio)
    * of a binary payload; null for a null payload. Fields are null when the
    * payload is corrupt (`is_audio` true) or not RIFF/WAVE (`is_audio`
    * false).
    */
  def audioHeader(payload: Column): Column =
    CatalystBridge.column(AudioHeader(CatalystBridge.expression(payload)))

  private val videoHeaderType = StructType(Seq(
    StructField("major_brand", StringType),
    StructField("timescale", LongType),
    StructField("duration_units", LongType),
    StructField("duration_ms", LongType),
    StructField("is_video", BooleanType, nullable = false)))

  /** ISO-BMFF (MP4) counterpart of [[AudioHeader]]: lifts
    * [[graft.ops.Multimodal.parseMp4Header]]'s big-endian box walk into
    * the expression layer (same codegen story — `CodegenFallback`, one
    * virtual call per row, adjacent projections stay fused).
    */
  case class VideoHeader(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = videoHeaderType
    override def prettyName: String = "video_header"

    override protected def nullSafeEval(input: Any): Any = {
      val p = input.asInstanceOf[Array[Byte]]
      graft.ops.Multimodal.parseMp4Header(p) match {
        case Some((brand, ts, units, ms)) =>
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(brand),
            ts, units, ms, true))
        case None =>
          new GenericInternalRow(Array[Any](
            null, null, null, null, graft.ops.Multimodal.looksLikeMp4(p)))
      }
    }

    override protected def withNewChildInternal(newChild: Expression): VideoHeader =
      copy(child = newChild)
  }

  /** struct(major_brand, timescale, duration_units, duration_ms, is_video)
    * of a binary payload; null for a null payload. Fields are null when
    * the payload is corrupt/truncated or mvhd v1 (`is_video` true) or not
    * ISO-BMFF at all (`is_video` false).
    */
  def videoHeader(payload: Column): Column =
    CatalystBridge.column(VideoHeader(CatalystBridge.expression(payload)))

  /** Register the SQL name on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_header", exprs => {
        require(exprs.length == 1, "image_header expects exactly 1 argument")
        ImageHeader(exprs.head)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "audio_header", exprs => {
        require(exprs.length == 1, "audio_header expects exactly 1 argument")
        AudioHeader(exprs.head)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "video_header", exprs => {
        require(exprs.length == 1, "video_header expects exactly 1 argument")
        VideoHeader(exprs.head)
      }, "scala_udf")
  }
}
