package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingling (round 16, SURVEY.md §2.11 discipline).
  *
  * The higher-order formulation
  * `when(size(ws) >= n, transform(sequence(1, size-(n-1)),
  * i => concat_ws(" ", element_at(ws, i), …))).otherwise(array())`
  * pays, per OUTPUT shingle: a lambda dispatch, n `element_at` calls and a
  * `concat_ws` — and the shingle projection is the map-side CPU of every
  * dedup/text query. [[WordShingles]] builds the identical array in one
  * kernel pass. Value semantics replicated exactly and pinned by a
  * differential property (TextExpressionsSpec):
  * - size(ws) < n (including 0) → EMPTY array,
  * - NULL input array → EMPTY array (the `when` guard's null-cond falls to
  *   the otherwise branch),
  * - null elements joined like `concat_ws` (skipped, no separator).
  */
object TextExpressions {

  /** Kernel: element i (0-based) = concat_ws(" ", ws[i], …, ws[i+n-1]). */
  def shingles(ws: ArrayData, n: Int): ArrayData = {
    val sz = ws.numElements()
    if (sz < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i < sz - n + 1) {
      var len = 0
      var nonNull = 0
      var k = 0
      while (k < n) {
        if (!ws.isNullAt(i + k)) {
          len += ws.getUTF8String(i + k).numBytes()
          nonNull += 1
        }
        k += 1
      }
      if (nonNull > 1) len += nonNull - 1
      val bytes = new Array[Byte](len)
      var off = 0
      var emitted = 0
      k = 0
      while (k < n) {
        if (!ws.isNullAt(i + k)) {
          if (emitted > 0) { bytes(off) = ' '.toByte; off += 1 }
          val s = ws.getUTF8String(i + k)
          s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += s.numBytes()
          emitted += 1
        }
        k += 1
      }
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `word_shingles(array<string>, n) → array<string>` — see object doc. */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1 && n <= 64, s"word_shingles: n in [1, 64], got $n")

    // containsNull = true matches the legacy `when(transform(...))
    // .otherwise(array().cast("array<string>"))` merged type — the cast
    // branch carries containsNull = true, and downstream explode output
    // nullability (hence Verify parquet schema, hence the driver's
    // schema_match) inherits it.
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = false
    override def prettyName: String = "word_shingles"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${t.simpleString}")
      }

    def emptyArray: ArrayData = new GenericArrayData(new Array[Any](0))

    override def eval(input: InternalRow): Any = {
      val ws = child.eval(input)
      if (ws == null) emptyArray
      else TextExpressions.shingles(ws.asInstanceOf[ArrayData], n)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wsE = child.genCode(ctx)
      val self = ctx.addReferenceObj("wordShingles", this,
        classOf[WordShingles].getName)
      val code =
        s"""
           |${wsE.code}
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
           |if (${wsE.isNull}) {
           |  ${ev.value} = $self.emptyArray();
           |} else {
           |  ${ev.value} = graft.functions.TextExpressions.shingles(
           |    ${wsE.value}, $n);
           |}
         """.stripMargin
      ev.copy(code = Block.BlockHelper(new StringContext(code)).code(),
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  /** Column form of [[WordShingles]]. */
  def wordShinglesFast(ws: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.CatalystBridge.column(WordShingles(
      org.apache.spark.sql.graft.CatalystBridge.expression(ws), n))
}
