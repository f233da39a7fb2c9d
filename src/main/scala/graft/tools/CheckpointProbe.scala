package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for localCheckpoint cost — separates "the machine's
  * storage/memory path got slower" from "a query regressed" when
  * checkpoint-heavy ops (withRangeRank, power-iteration graph/PCA,
  * IVF fit) drift together while scan-only queries stay flat.
  * Usage: runMain graft.tools.CheckpointProbe [rows]
  */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = graft.GraftSession.local(32)
    def time[A](tag: String)(f: => A): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $tag best=${ts.min}%.1f ms all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }
    val df = spark.range(rows).select(col("id"),
      (col("id") % 97).as("k"), rand(7).as("v"))
    time("count-only")(df.count())
    time("localCheckpoint")(df.localCheckpoint(true).count())
    time("groupBy-agg")(df.groupBy(col("k")).agg(sum(col("v"))).count())
    val parq = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    time("parquet-scan")(parq.count())
    time("parquet-checkpoint")(parq.localCheckpoint(true).count())
    spark.stop()
  }
}
