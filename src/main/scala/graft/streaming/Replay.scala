package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-batch replay of a stored series table (SURVEY.md §2.10).
  *
  * The reference's simulator (`stream_sim.py:15-83`) holds the tables in
  * memory sorted by timestamp and serves batches of `BATCH` distinct
  * timestamps per poll, with a seek (`/init_stream?start_time=`) and
  * wrap-around at end of data. [[cursorBatches]] reproduces those semantics
  * for tests/simulation; production streams should instead `readStream` the
  * append table (file source) and drive [[StreamKpis]] — replay pacing then
  * becomes the trigger interval and the time-compression factor maps
  * simulated time to wall time.
  *
  * Scale note: the distinct-timestamp cursor is collected to the driver —
  * that is the simulator's own design (a replay HARNESS, not a data path);
  * the data rows themselves stay distributed. The production-grade
  * [[ReplayStreamSource]] does NOT share this bound: its cursor is PAGED
  * (O(pageSize + distinct/pageSize) driver state, independent of the
  * event-time domain) — prefer it for anything beyond tests.
  */
object Replay {

  /** Distinct event times ≥ `startTime`, ascending (the cursor). */
  def cursor(df: DataFrame, tsCol: String, startTime: Option[String]): Seq[java.sql.Timestamp] = {
    val from = startTime.map(t => df.filter(col(tsCol) >= lit(t).cast("timestamp")))
      .getOrElse(df)
    from.select(col(tsCol)).distinct().orderBy(col(tsCol))
      .collect().map(_.getTimestamp(0)).toSeq
  }

  /** Iterator of micro-batch DataFrames, each covering `batchSize` distinct
    * timestamps (reference `stream_sim.py:52-58`, `BATCH=1` default).
    */
  def cursorBatches(df: DataFrame, tsCol: String, batchSize: Int = 1,
                    startTime: Option[String] = None,
                    wrap: Boolean = false): Iterator[DataFrame] = {
    val fromStart = cursor(df, tsCol, startTime)
    // Wrap-around at end of data (reference `stream_sim.py:60-61`): after
    // the seek position is exhausted, replay continues from the beginning
    // up to the seek point, then the iterator ends (one full cycle).
    val ts = if (wrap && startTime.isDefined) {
      val all = cursor(df, tsCol, None)
      fromStart ++ all.filterNot(fromStart.toSet)
    } else fromStart
    ts.grouped(batchSize).map { group =>
      df.filter(col(tsCol).isin(group: _*))
    }
  }

  /** Fast-forward pacing (reference `viz.py:583`: "1 simulated hour per N
    * wall seconds"): wall-clock delay before serving a batch whose event
    * time advanced by `simulatedAdvanceSec` over its predecessor.
    */
  def paceMillis(simulatedAdvanceSec: Double, wallSecondsPerSimHour: Double): Long =
    math.max(0L, math.round(simulatedAdvanceSec / 3600.0 * wallSecondsPerSimHour * 1000.0))
}
