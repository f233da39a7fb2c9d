package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.CatalystBridge
import graft.functions.HashExpressions

/** Round-16 optimization kernels vs the built-in md5 recipes they replace:
  * every derived value must be BIT-IDENTICAL to the historical
  * `conv(substring(md5(...), a, b), 16, 10)` formulation — the DuckDB
  * oracles replay that recipe, so any divergence here is a correctness
  * regression, not a perf detail.
  */
class HashExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys = (0 until 500).map(i => s"k$i:${i * 37}") ++
    Seq("", " ", "αβγ δε", "a:b:c", "0", "-1", "\u0001x")

  test("md5_chunk_uniforms ≡ conv(substr(md5(concat(k,':',g)),8c+1,8),16,10)/2^32") {
    for (groups <- Seq(1, 2, 8)) {
      val df = keys.toDF("k")
      val legacy = flatten(transform(
        sequence(lit(0), lit(groups - 1)), g => {
          val h = md5(concat(col("k"), lit(":"), g.cast("string")))
          transform(sequence(lit(0), lit(3)), c =>
            conv(h.substr(c * lit(8) + lit(1), lit(8)), 16, 10)
              .cast("double") / lit(4294967296.0))
        }))
      val fast = CatalystBridge.column(HashExpressions.Md5ChunkUniforms(
        CatalystBridge.expression(col("k")),
        CatalystBridge.expression(lit(groups))))
      val diff = df.select(legacy.as("a"), fast.as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(diff.count() == 0, s"groups=$groups must match bit-for-bit")
    }
  }

  test("md5_chunk_uniforms: null key yields 4·groups NULL elements") {
    val df = Seq[Option[String]](None, Some("x")).toDF("k")
    val fast = CatalystBridge.column(HashExpressions.Md5ChunkUniforms(
      CatalystBridge.expression(col("k")), CatalystBridge.expression(lit(2))))
    val rows = df.select(posexplode(fast).as(Seq("b", "u")))
      .groupBy().agg(count(lit(1)).as("n"), count(col("u")).as("nonNull"))
      .head()
    // 2 keys × 8 elements survive the explode; only the non-null key's 8
    // carry values — exactly the legacy chain's row survival.
    assert(rows.getLong(0) == 16 && rows.getLong(1) == 8)
  }

  test("md5_perm_hexes ≡ substring(md5(concat(g,':',s)), 1+8c, 8) in 4g+c order") {
    for (k <- Seq(1, 4, 16, 23)) {
      val nGroups = (k + 3) / 4
      val df = keys.toDF("s")
      val legacy = df
        .select(col("s"), explode(sequence(lit(0), lit(nGroups - 1))).as("g"))
        .withColumn("h", md5(concat(col("g").cast("string"), lit(":"), col("s"))))
        .select(col("s"), col("g"), col("h"),
          explode(sequence(lit(0), lit(3))).as("c"))
        .select(col("s"), (col("g") * 4 + col("c")).as("perm"),
          expr("substring(h, 1 + 8*c, 8)").as("mh"))
        .filter(col("perm") < k)
      val fast = df.select(col("s"),
        posexplode(CatalystBridge.column(HashExpressions.Md5PermHexes(
          CatalystBridge.expression(col("s")),
          CatalystBridge.expression(lit(k))))).as(Seq("perm", "mh")))
      assert(legacy.exceptAll(fast).count() == 0 &&
        fast.exceptAll(legacy).count() == 0, s"k=$k must match exactly")
    }
  }

  test("md5_hex_long ≡ conv(substring(md5(s), start, len), 16, 10)") {
    val df = keys.toDF("s")
    for ((start, len) <- Seq((1, 6), (1, 4), (1, 8), (9, 8), (1, 12), (7, 1))) {
      val legacy = conv(substring(md5(col("s")), start, len), 16, 10)
        .cast("long")
      val fast = CatalystBridge.column(HashExpressions.Md5HexLong(
        CatalystBridge.expression(col("s")), start, len))
      val diff = df.select(legacy.as("a"), fast.as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(diff.count() == 0, s"(start=$start, len=$len) must match")
    }
  }

  test("kernels run inside whole-stage codegen (no interpreted fallback)") {
    // range → string keeps the projection non-foldable (a literal local
    // table constant-folds the whole plan into LocalTableScan).
    val df = spark.range(100).select(col("id").cast("string").as("s"))
    val plan = df.select(
        CatalystBridge.column(HashExpressions.Md5ChunkUniforms(
          CatalystBridge.expression(col("s")),
          CatalystBridge.expression(lit(2)))).as("u"),
        CatalystBridge.column(HashExpressions.Md5PermHexes(
          CatalystBridge.expression(col("s")),
          CatalystBridge.expression(lit(16)))).as("h"),
        CatalystBridge.column(HashExpressions.Md5HexLong(
          CatalystBridge.expression(col("s")), 1, 6)).as("w"))
      .queryExecution.executedPlan.toString
    // The `*(n)` operator prefix IS the WholeStageCodegen marker in the
    // executedPlan toString (explain("formatted") spells out the name).
    assert(plan.contains("*(1) Project [md5_chunk_uniforms"),
      s"projection must stay codegen'd:\n$plan")
  }
}
