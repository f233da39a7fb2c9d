package graft.tools

import graft.{GraftSession, SparkEntry}

/** Precommit smoke: the flagship entry must return rows on sf0.001.
  * Prints ENTRY_SMOKE_OK so `tools/precommit.sh` can grep for success
  * rather than trust an exit code through sbt's log noise. Catches the
  * class of failure that lost round 10: a snapshot that compiles (or
  * doesn't) but was never executed.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(math.min(
      Runtime.getRuntime.availableProcessors(), 8))
    try {
      // Honor the directory argument: precommit.sh passes sf0.001, and a
      // smoke that silently ignored it (relying on SparkEntry.entry's
      // hardcoded path) would keep "passing" if the script pointed at
      // different data. Same flagship query as SparkEntry.entry.
      val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
      val n = SparkEntry.queries("cohort_analysis_e2e")(spark, dir).count()
      require(n > 0, s"entry returned $n rows")
      // A handful of cheap registry invariants while we're here: every
      // oracle key must have a query, and names must be unique-by-merge.
      val qs = SparkEntry.queries
      val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
      require(orphans.isEmpty, s"oracle keys without queries: $orphans")
      println(s"ENTRY_SMOKE_OK rows=$n queries=${qs.size} " +
        s"oracles=${SparkEntry.oracleSql.size}")
    } finally spark.stop()
  }
}
