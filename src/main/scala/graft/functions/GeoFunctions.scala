package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geospatial point functions (SURVEY.md §2.9).
  *
  * The engine stores points as `struct(lon double, lat double)` (SRID 4326 by
  * convention) — core Spark has no geometry type and the reference only
  * stores/decodes/draws points (reference `w4h_db_utils.py:52`,
  * `viz.py:126`). WKB decode cannot be expressed with built-ins (no
  * bits→double function), so it is a native Catalyst expression
  * (SURVEY.md §2.11 item 1) rather than a UDF: null handling comes from
  * `UnaryExpression`, and the expression participates in Catalyst (constant
  * folding, pruning) even though evaluation is interpreted
  * (`CodegenFallback` — one virtual call per row, no Python/serialization
  * cost; acceptable off the hot aggregate path).
  */
object GeoFunctions {

  private val pointType =
    StructType(Seq(StructField("lon", DoubleType), StructField("lat", DoubleType)))

  /** Decode a little-endian WKB POINT from a hex string (the reference's
    * stream payload format, `viz.py:126`: 21 bytes = 1 endian + 4 type +
    * 2×8 IEEE754 doubles). Returns struct(lon, lat); null for malformed
    * input (mirrors permissive client-side parsing).
    */
  case class WkbPointDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = pointType
    override def prettyName: String = "wkb_point_decode"

    override protected def nullSafeEval(input: Any): Any = {
      val hex = input.asInstanceOf[UTF8String].toString
      if (hex.length < 42) return null
      try {
        val bytes = new Array[Byte](hex.length / 2)
        var i = 0
        while (i < bytes.length) {
          bytes(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
          i += 1
        }
        val buf = java.nio.ByteBuffer.wrap(bytes)
        val littleEndian = bytes(0) == 1
        buf.order(if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
                  else java.nio.ByteOrder.BIG_ENDIAN)
        buf.position(1)
        val geomType = buf.getInt()
        if ((geomType & 0xff) != 1) return null // not a POINT
        val lon = buf.getDouble()
        val lat = buf.getDouble()
        new GenericInternalRow(Array[Any](lon, lat))
      } catch { case _: Exception => null }
    }

    override protected def withNewChildInternal(newChild: Expression): WkbPointDecode =
      copy(child = newChild)
  }

  /** Encode struct fields (lon, lat) to little-endian WKB POINT hex. */
  case class WkbPointEncode(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "wkb_point_encode"

    override protected def nullSafeEval(lon: Any, lat: Any): Any = {
      val buf = java.nio.ByteBuffer.allocate(21)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(1)
        .putDouble(lon.asInstanceOf[Double]).putDouble(lat.asInstanceOf[Double])
      val sb = new StringBuilder(42)
      buf.array().foreach(b => sb.append(f"${b & 0xff}%02x"))
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): WkbPointEncode =
      copy(left = l, right = r)
  }

  def wkbPointDecode(hex: Column): Column =
    CatalystBridge.column(WkbPointDecode(CatalystBridge.expression(hex)))

  def wkbPointEncode(lon: Column, lat: Column): Column =
    CatalystBridge.column(
      WkbPointEncode(CatalystBridge.expression(lon), CatalystBridge.expression(lat)))

  /** F11: WKT `POINT(lon lat)` encoding (reference `w4h_db_utils.py:197`).
    * Fixed 6-decimal formatting so the string is portable across engines.
    */
  def wktPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT("), format_string("%.6f", lon), lit(" "),
      format_string("%.6f", lat), lit(")"))

  /** "lon lat" pair with fixed 6-decimal formatting (trajectory vertices). */
  def pointString(lon: Column, lat: Column): Column =
    concat(format_string("%.6f", lon), lit(" "), format_string("%.6f", lat))

  /** Register SQL names for the custom expressions on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("wkb_point_decode",
      exprs => {
        require(exprs.length == 1, "wkb_point_decode expects exactly 1 argument")
        WkbPointDecode(exprs.head)
      }, "scala_udf")
    reg.createOrReplaceTempFunction("wkb_point_encode",
      exprs => {
        require(exprs.length == 2, "wkb_point_encode expects exactly 2 arguments")
        WkbPointEncode(exprs.head, exprs(1))
      }, "scala_udf")
  }
}
