package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc physical-plan dump for one query: `runMain graft.tools.PlanProbe
  * <query> [sfDir]` prints the executed plan plus counts of the join/scan
  * operators the plan guards assert on — the fast loop for diagnosing a
  * PlanShapeSpec failure without re-running the suite.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8)
    try {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"BNLJ=${"BroadcastNestedLoopJoin".r.findAllIn(p).size} " +
        s"IMR=${"InMemoryTableScan".r.findAllIn(p).size} " +
        s"SCANS=${"FileScan".r.findAllIn(p).size} " +
        s"CART=${"CartesianProduct".r.findAllIn(p).size}")
      println(p)
    } finally spark.stop()
  }
}
