package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.11).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * is codegen'd too, but each element pays lambda-variable plumbing and an
  * intermediate zipped array; at embedding width × corpus scale the dot
  * product IS the workload (every kNN/ANN/dedup score), so it gets a tight
  * primitive loop with `doGenCode` — no intermediate array, no boxing.
  *
  * Semantics are EXACTLY the sequential left fold of
  * `Σ (double)a(i) · (double)b(i)` the SQL/DuckDB formulation uses —
  * bit-identical results, so the oracle gates are unaffected.
  */
object VectorExpressions {

  /** `dot_product_d(array<float|double>, array<float|double>) → double`.
    * Null when either array is null, lengths differ, or any element is
    * null (the fold formulation propagates element nulls the same way).
    */
  case class DotProductD(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_product_d"

    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(lt, _), ArrayType(rt, _))
            if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float|double> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
      }

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val lf = elemIsFloat(left)
      val rf = elemIsFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val getL = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
                   else s"$a.getDouble($i)"
        val getR = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
                   else s"$b.getDouble($i)"
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $getL * $getR;
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotProductD = copy(left = l, right = r)
  }
}
