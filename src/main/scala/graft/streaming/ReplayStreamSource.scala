package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 micro-batch REPLAY source — the reference simulator's
  * contract (`stream_sim.py:15-83`: serve batches of N distinct event
  * timestamps, seek via start_time, wrap-around at end of data) as a real
  * Structured Streaming source, so the seek/pace semantics run under the
  * engine's own offset tracking, checkpointing and trigger loop instead of
  * the [[Replay.cursorBatches]] iterator harness.
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
  * Scale note: like the reference simulator (which holds the replay table
  * in memory) and Spark's own `MemoryStream`, this is a SIMULATION
  * harness — the table is loaded once driver-side and served as
  * per-timestamp row slices. The production ingest path is the file
  * source (`readStream` over the append directory, see `FileStreamSpec`);
  * replay exists to re-drive stored history deterministically.
  */
class ReplayStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(ReplayStreamSource.path(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ReplayTable(schema)
}

object ReplayStreamSource {
  private[streaming] def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "replay source requires a 'path' option")
    p
  }

  /** `yyyy-MM-dd HH:mm:ss[.SSS...]` interpreted in UTC (the engine's
    * session time zone, SURVEY §1.2) → epoch micros.
    */
  private[streaming] def parseMicros(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }
}

private[streaming] class ReplayTable(tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "graft_replay"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ReplayScan(tableSchema, options)
    }
}

private[streaming] class ReplayScan(schema: StructType,
                                    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ReplayMicroBatchStream(options)
}

/** Offset = number of distinct-timestamp slices served (serve order). */
private[streaming] case class ReplayOffset(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

/** One replay slice (all rows of one distinct event timestamp). UnsafeRow
  * is Externalizable, so the slice ships to executors like MemoryStream's
  * blocks do.
  */
private[streaming] case class ReplayInputPartition(rows: Array[InternalRow])
    extends InputPartition

private[streaming] class ReplayMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val pathOpt = ReplayStreamSource.path(options)
  private val tsCol = Option(options.get("tsCol")).getOrElse("ts")
  private val perTrigger =
    Option(options.get("timestampsPerTrigger")).map(_.toInt).getOrElse(1)
  private val simAdvanceUs =
    Option(options.get("simAdvancePerTriggerSec")).map(_.toDouble * 1e6).getOrElse(0.0)
  private val startingTs =
    Option(options.get("startingTimestamp")).map(ReplayStreamSource.parseMicros)
  private val wrap = Option(options.get("wrap")).exists(_.toBoolean)
  require(perTrigger > 0, "timestampsPerTrigger must be positive")

  // Driver-side cursor materialization, once per stream: rows grouped by
  // event time, ordered ascending, then rotated for seek/wrap. (ts, rows)
  // is retained so simAdvance batching can walk simulated time.
  private lazy val slices: Array[(Long, Array[InternalRow])] = {
    val df = SparkSession.active.read.parquet(pathOpt)
    val ord = df.schema.fieldIndex(tsCol)
    df.schema(ord).dataType match {
      case TimestampType | TimestampNTZType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"tsCol '$tsCol' must be a timestamp or epoch-long column, got $t")
    }
    val rows = df.queryExecution.executedPlan.executeCollect()
      .filter(!_.isNullAt(ord)) // a null event time has no replay position
    val grouped = rows.groupBy(_.getLong(ord)).toArray.sortBy(_._1)
    startingTs match {
      case None => grouped
      case Some(s0) =>
        val (pre, post) = grouped.partition(_._1 < s0)
        // Wrap-around (stream_sim.py:60-61): after the seek position is
        // exhausted, replay continues from the beginning up to the seek
        // point, then ends (one full cycle).
        if (wrap) post ++ pre else post
    }
  }

  // How far latestOffset has advanced. deserializeOffset bumps it on
  // checkpoint restore so a recovered query never plans end < start.
  private var served: Long = 0L

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def latestOffset(): Offset = {
    val n = slices.length.toLong
    if (served < n) {
      if (simAdvanceUs > 0) {
        // Time-based batching: serve every slice whose event time falls in
        // the next simAdvance window. A wrap point (event time jumps
        // backwards in serve order) ends the batch; the next trigger
        // starts a fresh window at the wrapped timestamp.
        val startTs = slices(served.toInt)._1
        var e = served + 1
        while (e < n && slices(e.toInt)._1 >= startTs &&
               slices(e.toInt)._1 < startTs + simAdvanceUs) e += 1
        served = e
      } else served = math.min(served + perTrigger, n)
    }
    ReplayOffset(served)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].idx.toInt
    val e = end.asInstanceOf[ReplayOffset].idx.toInt
    (s until e).map(i => ReplayInputPartition(slices(i)._2)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ReplayReaderFactory

  override def deserializeOffset(json: String): Offset = {
    val o = ReplayOffset(json.trim.toLong)
    served = math.max(served, o.idx)
    o
  }

  override def commit(end: Offset): Unit =
    served = math.max(served, end.asInstanceOf[ReplayOffset].idx)

  override def stop(): Unit = ()
}

private[streaming] class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ReplayInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}
