package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupState

/** Streaming windowed funnel: the incremental counterpart of
  * [[graft.ops.Funnel.windowedFunnel]] (greedy earliest-chain, whole
  * chain anchored within `windowSec` of the first stage-1 event).
  *
  * State per user is O(1) — the anchor time, the last-matched stage time,
  * and the level — NOT the event history: with events arriving in
  * event-time order per user (the replay-source contract every stateful
  * op here shares), the greedy chain advances monotonically, so each
  * event either extends the chain or is discarded immediately. Batch
  * parity therefore holds for ANY contiguous batch split of an ordered
  * stream (the same property the soft-dedup ingest proves); late
  * out-of-order events would need the full per-stage history and are out
  * of contract, exactly as for the trailing-KPI op.
  */
object StreamFunnel {

  final case class StageEvent(userId: Long, tsUs: Long, stage: Int)
  final case class FunnelState(t0Us: Long, lastUs: Long, level: Int)
  final case class FunnelProgress(userId: Long, t1Us: Long, funnelLevel: Int,
                                  converted: Boolean, secsToConvert: Option[Double])

  /** Advance one user's chain over an event-time-sorted slice. */
  private[graft] def advance(st: FunnelState, events: Seq[StageEvent],
                             nStages: Int, winUs: Long): FunnelState =
    events.sortBy(e => (e.tsUs, e.stage)).foldLeft(st) { (s, e) =>
      if (s.level == 0) {
        if (e.stage == 0) FunnelState(e.tsUs, e.tsUs, 1) else s
      } else if (s.level < nStages && e.stage == s.level &&
        e.tsUs > s.lastUs && e.tsUs <= s.t0Us + winUs) {
        s.copy(lastUs = e.tsUs, level = s.level + 1)
      } else s
    }

  /** Per-user funnel progression; emit with outputMode("update").
    * `stage` is the 0-based index into the funnel's stage sequence
    * (map event types to indexes upstream; non-stage events filtered).
    */
  def progress(events: Dataset[StageEvent], nStages: Int, windowSec: Long)(
      implicit outEnc: org.apache.spark.sql.Encoder[FunnelProgress],
      stEnc: org.apache.spark.sql.Encoder[FunnelState]): Dataset[FunnelProgress] = {
    val winUs = windowSec * 1000000L
    events.groupByKey(_.userId)(org.apache.spark.sql.Encoders.scalaLong)
      .mapGroupsWithState[FunnelState, FunnelProgress] {
        (userId: Long, batch: Iterator[StageEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(0L, 0L, 0))
          val next = advance(prev, batch.toSeq, nStages, winUs)
          state.update(next)
          FunnelProgress(userId,
            if (next.level > 0) next.t0Us else 0L,
            next.level,
            next.level == nStages,
            if (next.level == nStages)
              Some((next.lastUs - next.t0Us).toDouble / 1e6)
            else None)
      }
  }
}
