package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4).
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles sort-merge
  * skew at runtime; explicit salting remains necessary when a hot key must
  * flow through a shuffle HASH join or aggregation whose single reducer
  * would otherwise be the straggler.
  */
object Skew {

  /** Salted equi-join: the big side scatters each row into one of `salts`
    * sub-keys; the small side replicates `salts`×. Row-for-row equivalent
    * to `big.join(small, keys)` while splitting each hot key across
    * `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial agg on (key, salt), final agg
    * on key — splits a hot group across `salts` partial reducers. `aggs`
    * maps output column → (partialExpr, finalExpr) column names are applied
    * in order. Provided for count/sum-like decomposable aggregates.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
}
