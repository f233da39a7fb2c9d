package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * Tuned for the driver's harness (single-JVM `local[N]`) but every knob is
  * chosen for cluster scale: AQE on (runtime re-plan + skew-join splitting),
  * shuffle partitions sized to cores locally (on a real cluster AQE coalesces
  * from a higher initial number), UTC session time (reference assumes UTC
  * everywhere — see SURVEY.md §1.2 / reference `stream_sim.py:73-75`).
  */
object GraftSession {

  /** Configs every Graft session needs regardless of master. Installs the
    * engine's Catalyst extensions (DateCastRewrite) — a no-op when an
    * existing session is reused by getOrCreate.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Runtime bloom-filter pushdown: a selective join side injects a
      // bloom filter into the large side's scan — at 100 TB this prunes
      // fact-table IO for cohort-style joins before the shuffle.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read as epoch-nanos Long and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // µs timestamps on write: unambiguous for the DuckDB oracle compare.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = math.max(cores, 4)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
