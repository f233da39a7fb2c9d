package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Round-16 optimization evidence: dump `.explain("formatted")` for the
  * named queries to `plans/r16/<query>_<suffix>.txt`.
  *
  * `runMain graft.tools.ExplainDump <suffix> <q1,q2,...> [sfDir] [outDir]`
  *
  * The formatted plan is the pre-execution plan (AQE `isFinalPlan=false`) —
  * exactly what `df.explain("formatted")` prints; Exchange counts, join
  * strategies, PushedFilters and ReadSchema are all visible at this stage,
  * which is what the optimization round's plan claims cite.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val out = if (args.length > 3) args(3) else "plans/r16"
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query '$n'"))
    val spark = GraftSession.local(8)
    try {
      Files.createDirectories(Paths.get(out))
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$out/${n}_$suffix.txt"), txt)
        val p = df.queryExecution.executedPlan.toString
        System.err.println(f"[explain] $n%-34s Exchange=${
          "Exchange".r.findAllIn(txt).size}%2d SMJ=${
          "SortMergeJoin".r.findAllIn(p).size}%2d BHJ=${
          "BroadcastHashJoin".r.findAllIn(p).size}%2d -> $out/${n}_$suffix.txt")
        graft.ops.OpCaches.releaseAll()
        spark.catalog.clearCache()
      }
    } finally spark.stop()
  }
}
