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
  * stream (the same property the soft-dedup ingest proves). For events
  * shuffled ACROSS batches use [[progressOutOfOrder]]: it buffers only
  * the watermark-unripe suffix and folds events exactly once they are
  * final, so parity extends to any watermark-bounded disorder at the
  * cost of the bounded buffer.
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

  final case class StampedStageEvent(userId: Long, ts: java.sql.Timestamp,
                                     stage: Int)
  final case class OooFunnelState(committed: FunnelState,
                                  buffer: Seq[StageEvent], seen: Long)
  final case class OooFunnelProgress(userId: Long, t1Us: Long,
                                     funnelLevel: Int, converted: Boolean,
                                     secsToConvert: Option[Double],
                                     nEvents: Long)

  /** One trigger's worth of the out-of-order fold, as a pure function
    * (the ScalaCheck property folds it directly): buffered + incoming
    * events split at the watermark — those strictly before it are FINAL
    * (no event at or below can still arrive: Spark drops ts < watermark
    * but ADMITS ts == watermark, so equal-timestamp events stay
    * buffered one more trigger), so
    * they fold irrevocably into the committed chain via [[advance]]
    * (which sorts them, restoring event-time order); the rest stay
    * buffered. The emitted view folds the buffer speculatively on top,
    * so output always reflects everything seen. The time split is
    * sound because committed events are ≤ some earlier watermark and
    * buffered events are > the current one: the global fold order is
    * event-time order whenever disorder is watermark-bounded.
    */
  private[graft] def oooStep(st: OooFunnelState, incoming: Seq[StageEvent],
                             wmUs: Long, nStages: Int, winUs: Long)
      : (OooFunnelState, FunnelState) = {
    val all = st.buffer ++ incoming
    // STRICTLY below the watermark: Spark admits events with ts ==
    // watermark in later triggers (only ts < watermark is dropped), so a
    // boundary-timestamp event committed at `<=` could be followed by an
    // equal-timestamp sibling that then folds AFTER the commit, diverging
    // from the globally ordered fold. `<` keeps boundary events buffered
    // one more trigger, until the watermark passes them.
    val (ripe, pending) = all.partition(_.tsUs < wmUs)
    val committed = advance(st.committed, ripe, nStages, winUs)
    (OooFunnelState(committed, pending, st.seen + incoming.size),
      advance(committed, pending, nStages, winUs))
  }

  /** Out-of-order-tolerant funnel: like [[progress]] but correct for
    * events shuffled ACROSS micro-batches, as long as the disorder is
    * bounded by the stream's watermark delay — the caller MUST attach
    * `withWatermark("ts", delay)` before this call (without one the
    * watermark never advances and the buffer never evicts). State per
    * user is the O(1) committed chain plus the watermark-bounded buffer
    * (per-user event rate × delay — the same bound every watermarked
    * aggregation carries), evicted as the watermark advances. Emit with
    * outputMode("update"); `nEvents` grows monotonically, so "row with
    * max nEvents per user" is the final answer even though a late
    * re-anchoring stage-0 can lower a SPECULATIVE level between
    * triggers.
    */
  def progressOutOfOrder(events: Dataset[StampedStageEvent], nStages: Int,
                         windowSec: Long)(
      implicit outEnc: org.apache.spark.sql.Encoder[OooFunnelProgress],
      stEnc: org.apache.spark.sql.Encoder[OooFunnelState])
      : Dataset[OooFunnelProgress] = {
    val winUs = windowSec * 1000000L
    events.groupByKey(_.userId)(org.apache.spark.sql.Encoders.scalaLong)
      .mapGroupsWithState[OooFunnelState, OooFunnelProgress] {
        (userId: Long, batch: Iterator[StampedStageEvent],
         state: org.apache.spark.sql.streaming.GroupState[OooFunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption
            .getOrElse(OooFunnelState(FunnelState(0L, 0L, 0), Nil, 0L))
          val incoming = batch
            .map(e => StageEvent(e.userId, e.ts.getTime * 1000L, e.stage))
            .toSeq
          val (next, spec) = oooStep(prev, incoming, wmUs, nStages, winUs)
          state.update(next)
          OooFunnelProgress(userId,
            if (spec.level > 0) spec.t0Us else 0L,
            spec.level,
            spec.level == nStages,
            if (spec.level == nStages)
              Some((spec.lastUs - spec.t0Us).toDouble / 1e6)
            else None,
            next.seen)
      }
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
