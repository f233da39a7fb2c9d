package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility as a text-quality signal: DEFLATE (RFC 1951, via
  * `java.util.zip` — JDK-only, no added dependency) size of the UTF-8
  * text. Repetitive/templated/generated text compresses far better than
  * natural prose, so deflate_size/raw_size is the classic cheap
  * low-quality detector in large-corpus curation.
  *
  * A native Catalyst `Expression`, not a UDF (SURVEY §2.11 preference
  * order): null handling from `UnaryExpression`, participates in constant
  * folding/pruning; `CodegenFallback` interpretation — one virtual call
  * per row, no serialization boundary. NOT oracle-expressible (DuckDB has
  * no deflate surface), so its gate is rows-only and the semantics are
  * spec-asserted.
  */
object CompressionFunctions {

  case class DeflateSize(child: Expression, level: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "deflate_size"

    // One native zlib stream per (thread, expression instance), reset
    // between rows — per-row Deflater construction/teardown would spend
    // more time in native stream init than in compression.
    @transient private lazy val deflater: ThreadLocal[java.util.zip.Deflater] =
      ThreadLocal.withInitial(() => new java.util.zip.Deflater(level, true))

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      // raw deflate (nowrap): no zlib header/checksum noise in the size.
      val d = deflater.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    }

    override protected def withNewChildInternal(newChild: Expression): DeflateSize =
      copy(child = newChild)
  }

  /** Deflate-compressed byte count of a string column. */
  def deflateSize(text: Column, level: Int = 6): Column =
    CatalystBridge.column(DeflateSize(CatalystBridge.expression(text), level))
}
