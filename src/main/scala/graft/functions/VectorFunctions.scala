package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * All reductions are SEQUENTIAL left folds (`aggregate` over the array) in
  * double precision — the same evaluation order DuckDB's `list_sum(
  * list_transform(...))` uses — so cosine scores are bit-identical across
  * engines. Everything stays inside whole-stage codegen; no UDFs.
  */
object VectorFunctions {

  /** Dot product in double precision (left fold, deterministic order). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * 16 md5 bits shifted to [-32768, 32767]. Portable: DuckDB
    * `('0x'||substr(md5(p||'_'||j),1,4))::BIGINT - 32768`.
    */
  def planeCoeff(p: Column, j: Column): Column =
    (conv(substring(md5(concat(p.cast("string"), lit("_"), j.cast("string"))), 1, 4), 16, 10)
      .cast("long") - 32768).cast("double")

  /** Signed projection of `v` onto deterministic hyperplane `p`. */
  def planeDot(v: Column, p: Column): Column =
    aggregate(sequence(lit(0), size(v) - 1), lit(0.0),
      (acc, j) => acc + planeCoeff(p, j) * element_at(v, j + 1).cast("double"))

  /** Signed-random-projection LSH bucket id over `planes` hyperplanes. */
  def lshBucket(v: Column, planes: Int): Column =
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => acc + when(planeDot(v, p) >= 0, pow(lit(2.0), p).cast("long"))
        .otherwise(lit(0L)))
}
