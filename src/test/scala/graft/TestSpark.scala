package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    // Fresh warehouse per test JVM: the in-memory catalog forgets managed
    // tables between runs, but their files would survive and collide.
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.warehouse.dir", wh),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
