package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide→long melt (SURVEY.md §2.1 S10; reference `w4h_db_utils.py:176-200`):
  * the import path that turns one wide CSV row into one long row per mapped
  * feature column, renamed to the canonical `(key..., metric, value)` shape.
  *
  * Uses the `stack` generator — a single projection, no join/shuffle; output
  * partitioning inherits the input's, so a following `write.partitionBy`
  * or per-feature filter needs no extra exchange.
  */
object Melt {

  def apply(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
            metricCol: String = "metric", valueCol: String = "value"): DataFrame = {
    val stackArgs = valueCols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    df.select(idCols.map(col) :+
      expr(s"stack(${valueCols.length}, $stackArgs) AS ($metricCol, $valueCol)"): _*)
  }
}
