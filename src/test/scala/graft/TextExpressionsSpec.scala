package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextExpressions

/** Native word_shingles vs the legacy higher-order formulation:
  * bit-identical values, empty/null semantics, type nullability, and
  * codegen (the projection must not fall back to interpreted eval).
  */
class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def legacy(ws: org.apache.spark.sql.Column, n: Int) =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  test("word_shingles ≡ the transform/element_at/concat_ws formulation") {
    val texts = Seq("", "a", "a b", "a b c", "a b c d e f g",
      "x  y", " padded  text here ", "αβ γδ ε", "a:b c:d e",
      "one two three four five six seven eight nine ten") ++
      (0 until 200).map(i => (0 to i % 12).map(j => s"w${i}_$j").mkString(" "))
    val df = texts.toDF("t").select(split(trim(col("t")), " ").as("ws"))
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = df.select(legacy(col("ws"), n).as("a"),
          TextExpressions.wordShinglesFast(col("ws"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(diff.count() == 0, s"n=$n must match exactly")
    }
  }

  test("null input array and null elements match the legacy semantics") {
    val df = spark.sql(
      "SELECT * FROM VALUES (array('a', CAST(NULL AS STRING), 'c')), " +
        "(CAST(NULL AS ARRAY<STRING>)), (array()) AS t(ws)")
    val diff = df.select(legacy(col("ws"), 2).as("a"),
        TextExpressions.wordShinglesFast(col("ws"), 2).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() == 0)
    // containsNull must match the legacy merged type (drives explode
    // output nullability, hence Verify parquet schema).
    val lt = df.select(legacy(col("ws"), 2).as("x")).schema("x").dataType
    val ft = df.select(TextExpressions.wordShinglesFast(col("ws"), 2).as("x"))
      .schema("x").dataType
    assert(lt == ft, s"$lt vs $ft")
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(50)
      .select(split(concat(lit("a b c d"), col("id").cast("string")), " ").as("ws"))
      .select(TextExpressions.wordShinglesFast(col("ws"), 3).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [word_shingles"), plan)
  }
}
