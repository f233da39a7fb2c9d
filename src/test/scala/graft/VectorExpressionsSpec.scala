package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native DotProductD vs the higher-order-function fold: bit-identical
  * values (same sequential left fold), null semantics, and codegen (the
  * expression must not fall back to interpreted evaluation).
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot product is bit-identical to the fold formulation") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.select(col("vec_id"), col("embedding").as("va"))
    val b = emb.select((col("vec_id") + 7).as("vec_id"), col("embedding").as("vb"))
    val joined = a.join(b, "vec_id")
    val diff = joined.select(
      VectorFunctions.dotD(col("va"), col("vb")).as("fast"),
      VectorFunctions.dotFold(col("va"), col("vb")).as("fold"))
      .filter(not(col("fast") <=> col("fold")))
    assert(diff.count() == 0, "every pair must match bit-for-bit")
  }

  test("null semantics: null array, length mismatch, null element") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (2L, None, Some(Seq(1.0))),                        // null array
      (3L, Some(Seq(1.0, 2.0)), Some(Seq(1.0)))          // length mismatch
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorFunctions.dotD(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    // Element-level null propagates (same as the fold formulation).
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS a, " +
        "array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS b")
    assert(withNullElem.select(VectorFunctions.dotD(col("a"), col("b"))).head().isNullAt(0))
  }

  test("dot_product_d is registered as a SQL function via the extensions") {
    val r = spark.sql(
      "SELECT dot_product_d(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("dot product participates in whole-stage codegen (no fallback)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = emb.select(VectorFunctions.dotD(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // A `*(n)` prefix marks operators inside a WholeStageCodegen stage; the
    // projection evaluating the expression must carry it.
    assert("""\*\(\d+\) Project \[dot_product_d""".r.findFirstIn(plan).isDefined,
      plan.take(500))
    // Interpreted-mode safety net still works (CodegenFallback would hide
    // doGenCode bugs; force interpreted eval and compare).
    val sum1 = df.agg(sum(col("d"))).head().getDouble(0)
    val sum2 = emb.select(VectorFunctions.dotFold(col("embedding"), col("embedding")).as("d"))
      .agg(sum(col("d"))).head().getDouble(0)
    assert(sum1 == sum2)
  }
}
