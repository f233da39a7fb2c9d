package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` package space solely to satisfy the access
  * modifier; keep it to these two forwarders.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The physical plan of a streaming query's last executed micro-batch
    * (None before the first batch) — for plan-shape assertions on
    * streaming sources; `StreamingQueryWrapper` is `private[sql]`.
    */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString)
      case _ => None
    }

  /** The materialized RDD behind a `localCheckpoint`ed Dataset (None for
    * any other plan shape). `Dataset.unpersist` only touches the
    * CacheManager entry; the checkpoint's MEMORY_AND_DISK blocks belong to
    * this underlying RDD (`LogicalRDD` is `private[sql]`), so releasing
    * them early — instead of waiting for driver GC + ContextCleaner —
    * needs this handle.
    */
  def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
