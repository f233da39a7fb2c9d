package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Micro-batch REPLAY source — the reference simulator's contract
  * (`stream_sim.py:15-83`: serve batches of N distinct event timestamps,
  * seek via start_time, wrap-around at end of data) as a real Structured
  * Streaming source, so the seek/pace semantics run under the engine's own
  * offset tracking, checkpointing and trigger loop instead of the
  * [[Replay.cursorBatches]] iterator harness.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[ReplayStreamSource].getName)
  *   .option("path", "/data/series.parquet")   // required
  *   .option("tsCol", "ts")                    // event-time column
  *   .option("timestampsPerTrigger", "2")      // batch granularity (BATCH=N)
  *   .option("startingTimestamp", "1970-01-01 00:02:00") // seek (UTC)
  *   .option("wrap", "true")                   // replay pre-seek prefix last
  *   .option("simAdvancePerTriggerSec", "3600") // OR time-based batching
  *   .load()
  * }}}
  *
  * Offsets are indices into the distinct-timestamp cursor (serve order),
  * so a restart from a checkpoint resumes at the exact replay position.
  * TIME COMPRESSION ("1 simulated hour per N wall seconds",
  * reference `viz.py:583`) composes from two knobs: simulated time per
  * trigger here (`simAdvancePerTriggerSec`), wall time per trigger via the
  * query's `Trigger.ProcessingTime` (use [[Replay.paceMillis]] to derive
  * it).
  *
  * Scale: the driver holds ONLY the distinct-timestamp cursor — O(distinct
  * event times), independent of row count. Each micro-batch is a REAL
  * parquet scan filtered to the batch's event-time range (executors read
  * their own splits; the timestamp predicate reaches the scan as a pushed
  * filter for row-group pruning), so replaying a large stored history
  * never materializes rows on the driver — unlike the reference simulator,
  * which loads all three tables into memory. Implemented against the V1
  * `Source` API precisely because its `getBatch` returns a DataFrame: the
  * batch can BE the filtered distributed scan (the same mechanism Spark's
  * own file stream source uses), where the V2 partition route would have
  * to ship driver-collected rows.
  */
class ReplayStreamSource extends StreamSourceProvider {
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val opts = CaseInsensitiveMap(parameters)
    ("graft_replay", schema.getOrElse(
      sqlContext.sparkSession.read.parquet(ReplayStreamSource.path(opts)).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val opts = CaseInsensitiveMap(parameters)
    // The batch scans read the parquet table's own schema; silently
    // accepting a different user-supplied one would surface later as a
    // confusing batch-vs-source schema mismatch inside the stream engine.
    schema.foreach { s =>
      val inferred = sqlContext.sparkSession.read
        .parquet(ReplayStreamSource.path(opts)).schema
      require(s == inferred,
        s"replay source infers its schema from the parquet table ($inferred); " +
          "drop the explicit .schema(...) or make it identical")
    }
    new ReplaySource(sqlContext.sparkSession, opts)
  }
}

object ReplayStreamSource {
  private[streaming] def path(options: Map[String, String]): String =
    options.getOrElse("path",
      throw new IllegalArgumentException("replay source requires a 'path' option"))

  /** `yyyy-MM-dd HH:mm:ss[.SSS...]` interpreted in UTC (the engine's
    * session time zone, SURVEY §1.2) → epoch micros.
    */
  private[streaming] def parseMicros(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }
}

/** The V1 streaming source behind [[ReplayStreamSource]]. Offset = number
  * of distinct-timestamp slices served (serve order, post-seek rotation).
  */
private[streaming] class ReplaySource(spark: SparkSession,
                                      options: Map[String, String])
    extends Source {

  private val pathOpt = ReplayStreamSource.path(options)
  private val tsCol = options.getOrElse("tsCol", "ts")
  private val perTrigger = options.get("timestampsPerTrigger").map(_.toInt).getOrElse(1)
  private val simAdvanceUs =
    options.get("simAdvancePerTriggerSec").map(_.toDouble * 1e6).getOrElse(0.0)
  private val startingTs =
    options.get("startingTimestamp").map(ReplayStreamSource.parseMicros)
  private val wrap = options.get("wrap").exists(_.toBoolean)
  require(perTrigger > 0, "timestampsPerTrigger must be positive")

  private val table: DataFrame = spark.read.parquet(pathOpt)
  private val tsField = table.schema(
    table.schema.fieldIndex(tsCol)) // throws with a clear message if absent
  tsField.dataType match {
    case TimestampType | TimestampNTZType | LongType => ()
    case t => throw new IllegalArgumentException(
      s"tsCol '$tsCol' must be a timestamp or epoch-long column, got $t")
  }

  override def schema: StructType = table.schema

  /** The ONLY driver-side state: distinct event times (micros) in serve
    * order — ascending, then rotated for seek/wrap
    * (stream_sim.py:60-61: after the seek position is exhausted, replay
    * continues from the beginning up to the seek point, then ends).
    * Row slices are never collected; they stay executor-side in the
    * per-batch scans.
    */
  private lazy val cursor: Array[Long] = {
    val distinct = table
      .filter(col(tsCol).isNotNull) // a null event time has no replay position
      .select(col(tsCol)).distinct().orderBy(col(tsCol))
      .queryExecution.executedPlan.executeCollect().map(_.getLong(0))
    startingTs match {
      case None => distinct
      case Some(s0) =>
        val (pre, post) = distinct.partition(_ < s0)
        if (wrap) post ++ pre else post
    }
  }

  // How far getOffset has advanced. getBatch/commit bump it on checkpoint
  // restore (the restored offset arrives there) so a recovered query never
  // plans end < start.
  private var served: Long = 0L

  override def getOffset: Option[Offset] = {
    val n = cursor.length.toLong
    if (served < n) {
      if (simAdvanceUs > 0) {
        // Time-based batching: serve every slice whose event time falls in
        // the next simAdvance window. A wrap point (event time jumps
        // backwards in serve order) ends the batch; the next trigger
        // starts a fresh window at the wrapped timestamp.
        val startTs = cursor(served.toInt)
        var e = served + 1
        while (e < n && cursor(e.toInt) >= startTs &&
               cursor(e.toInt) < startTs + simAdvanceUs) e += 1
        served = e
      } else served = math.min(served + perTrigger, n)
    }
    if (served == 0) None else Some(LongOffset(served))
  }

  /** LongOffset live; anything else (SerializedOffset on restore) by its
    * json payload — both are the plain slice index.
    */
  private def toIdx(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  // Event-time literal in the column's own type (all three accepted types
  // store micros internally).
  private def tsLit(us: Long) =
    CatalystBridge.column(Literal(us, tsField.dataType))

  // The batch scan's base relation, resolved once and marked isStreaming
  // (a V1 micro-batch must be; see CatalystBridge.streamingFileScan).
  private lazy val streamingTable: DataFrame =
    CatalystBridge.streamingFileScan(spark, "parquet", pathOpt)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(toIdx).getOrElse(0L)
    val e = toIdx(end)
    served = math.max(served, e)
    val ts = (s until e).map(i => cursor(i.toInt))
    if (ts.isEmpty) return streamingTable.filter(lit(false))
    // The slice indices are contiguous in serve order; event times ascend
    // except at the single wrap point, so the batch is at most two
    // ascending runs. Each run of consecutive DISTINCT timestamps is
    // exactly the rows in [lo, hi] — a range predicate the parquet scan
    // prunes row groups with.
    val runs = ArrayBuffer.empty[(Long, Long)]
    var lo = ts.head
    var prev = ts.head
    ts.tail.foreach { t =>
      if (t < prev) { runs += ((lo, prev)); lo = t }
      prev = t
    }
    runs += ((lo, prev))
    streamingTable.filter(runs.map { case (rLo, rHi) =>
      col(tsCol) >= tsLit(rLo) && col(tsCol) <= tsLit(rHi)
    }.reduce(_ || _))
  }

  override def commit(end: Offset): Unit =
    served = math.max(served, toIdx(end))

  override def stop(): Unit = ()
}
