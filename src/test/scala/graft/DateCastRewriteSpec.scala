package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DateCastRewrite

class DateCastRewriteSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    // Runtime injection path; production uses GraftExtensions/withExtensions.
    if (!s.experimental.extraOptimizations.contains(DateCastRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ DateCastRewrite
    s
  }
  import spark.implicits._

  private def ts(str: String) = java.sql.Timestamp.valueOf(str)

  private lazy val parquetDir = {
    val dir = Files.createTempDirectory("graft_dcr").toString + "/t"
    Seq(
      ("before", ts("2024-01-04 23:59:59")),
      ("in1", ts("2024-01-05 00:00:00")),
      ("in2", ts("2024-01-07 23:59:59")),
      ("after", ts("2024-01-08 00:00:00"))
    ).toDF("id", "t").write.parquet(dir)
    dir
  }

  test("to_date comparisons rewrite to pushable timestamp bounds") {
    val df = spark.read.parquet(parquetDir)
      .filter(to_date(col("t")) >= lit("2024-01-05") &&
        to_date(col("t")) <= lit("2024-01-07"))
    // Semantics preserved:
    assert(df.select("id").as[String].collect().sorted.toSeq == Seq("in1", "in2"))
    // The optimized plan compares the raw column, and the scan sees bounds:
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cast(t"),
      s"date cast survived optimization:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(t,") || physical.contains("PushedFilters"),
      s"no pushed bounds in:\n$physical")
  }

  test("equality on to_date becomes a day interval") {
    val df = spark.read.parquet(parquetDir)
      .filter(to_date(col("t")) === lit("2024-01-07"))
    assert(df.select("id").as[String].collect().toSeq == Seq("in2"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("cast(t"))
  }

  test("strict inequalities and mirrored forms stay correct") {
    val base = spark.read.parquet(parquetDir)
    val gt = base.filter(to_date(col("t")) > lit("2024-01-05"))
      .select("id").as[String].collect().toSet
    assert(gt == Set("in2", "after"))
    val mirrored = base.filter(lit("2024-01-05").cast("date") >= to_date(col("t")))
      .select("id").as[String].collect().toSet
    assert(mirrored == Set("before", "in1"))
  }

  test("naive levenshtein threshold predicates rewrite to the bounded form") {
    import graft.plans.BoundedLevenshteinRewrite
    if (!spark.experimental.extraOptimizations.contains(BoundedLevenshteinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BoundedLevenshteinRewrite
    import spark.implicits._
    // Parquet round-trip: a LocalRelation would constant-fold the filter
    // away before the rule's effect is observable.
    val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString + "/t"
    Seq(("kitten", "sitting"), ("abc", "abd"), ("short", "muchlongerstring"))
      .toDF("a", "b").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val filtered = df.filter(levenshtein(col("a"), col("b")) <= 2)
    val opt = filtered.queryExecution.optimizedPlan.toString
    // The bounded 3-arg levenshtein and the length pigeonhole must appear.
    assert(opt.contains("levenshtein(a#") && opt.contains("Some(2))"),
      s"expected bounded levenshtein in:\n$opt")
    assert(opt.toLowerCase.contains("abs((length(a"),
      s"expected length-difference guard in:\n$opt")
    // Semantics unchanged: only the distance-1 pair survives.
    assert(filtered.select("a").as[String].collect().toSeq == Seq("abc"))
    // Strict form too.
    val strict = df.filter(levenshtein(col("a"), col("b")) < 3)
      .select("a").as[String].collect().toSet
    assert(strict == Set("abc"))
  }
}
