package graft

/** Pure over-budget adjudication for [[Bench]] (r15 verdict #2): all the
  * budget/host-factor arithmetic, extracted so a spec can prove the
  * adjudication invariants without running Spark.
  *
  * The host problem this solves: the box is a shared-metal VM with BURSTY
  * CPU steal. A single session-wide host factor (the r11–r15 design)
  * normalizes sustained load correctly, but a query whose best-of-3 lands
  * inside a burst window still reads over its 2× budget, gets flagged,
  * and then retracts on the end-of-session re-measure — churn on every
  * noisy session. The sentinel baskets are ALREADY timed every 20
  * queries, so each query has bracketing basket readings: its budget now
  * scales by the LOCAL host factor (the larger of the two cost-class
  * ratios, each the max of the two checkpoints bracketing the query's
  * position) instead of the session median. A burst the sentinels see
  * exonerates the queries timed inside it; a genuine regression still
  * flags because real code slowdowns don't move the sentinel baskets.
  *
  * Invariants (pinned by BenchAdjudicationSpec):
  *   - Uniform perturbation invariance: scaling every reading AND every
  *     basket by the same factor ≤ cap yields the identical flag set a
  *     quiet session produces.
  *   - Burst exoneration: a reading over raw budget inside a window whose
  *     bracketing baskets show the same inflation is not flagged; the
  *     same reading with quiet brackets is.
  *   - The factor clamps to [1, cap]: a fast host never tightens budgets
  *     below the 2× contract, and a catastrophic host cannot exonerate an
  *     unbounded regression.
  * The keep-min ratchet is untouched by any of this: factors scale
  * BUDGETS only, never the recorded times.
  */
object BenchAdjudication {
  /** First-measurement floor: a query with no history entry has no
    * baseline to regress from, and first measurements carry codegen/JIT
    * noise.
    */
  val FloorSec = 4.0
  /** Tracked queries get max(2×prev, min(2 s, 2.5×prev), 0.25 s) — see
    * Bench's scaladoc for the round-9 blind-spot history behind the
    * three terms.
    */
  val TrackedFloorSec = 2.0
  val MicroFloorSec = 0.25
  /** Host-factor clamp ceiling: a catastrophic host can't hide a genuine
    * 5× regression.
    */
  val FactorCap = 2.5

  /** Sentinel basket series with the query-index position of each
    * reading: positions(0) = 0 (pre-session), one per mid-session
    * checkpoint, last = nQueries (end-of-session). `cheap` and `mid` are
    * the two cost-class baskets, aligned with `positions`; -1 marks a
    * basket that failed to time.
    */
  final case class Checkpoints(positions: Vector[Int], cheap: Vector[Double],
                               mid: Vector[Double]) {
    require(positions.size == cheap.size && positions.size == mid.size,
      s"misaligned checkpoint series: ${positions.size}/${cheap.size}/${mid.size}")
  }

  def clampFactor(r: Double): Double =
    math.min(FactorCap, math.max(1.0, r))

  private def validRatio(reading: Double, hist: Double): Double =
    if (reading > 0 && reading < Double.MaxValue && hist > 0) reading / hist
    else -1.0

  private def medianValid(xs: Seq[Double]): Double = {
    val v = xs.filter(t => t > 0 && t < Double.MaxValue).sorted
    if (v.isEmpty) -1.0 else v(v.size / 2)
  }

  /** Host factor LOCAL to query index i: for each cost class, the max of
    * the ratios at the two checkpoints bracketing i (max, not
    * interpolation — a burst seen at either edge exonerates; the clamp
    * and the flag-never-ratchets rule bound the cost of being generous);
    * across classes, the larger ratio — a query is only exonerated by
    * drift its own cost class actually shows, and taking the max still
    * flags anything outgrowing both. No valid ratio at all ⇒ 1.0 (no
    * history to normalize against ⇒ raw budgets).
    */
  def localFactor(cps: Checkpoints, i: Int, histCheap: Double,
                  histMid: Double): Double = {
    val hiIdx0 = cps.positions.indexWhere(_ > i)
    val hiIdx = if (hiIdx0 < 0) cps.positions.size - 1 else hiIdx0
    val loIdx = math.max(0, hiIdx - 1)
    def classFactor(readings: Vector[Double], hist: Double): Double = {
      val rs = Seq(loIdx, hiIdx).map(j => validRatio(readings(j), hist))
        .filter(_ > 0)
      if (rs.isEmpty) -1.0 else rs.max
    }
    val rs = Seq(classFactor(cps.cheap, histCheap),
      classFactor(cps.mid, histMid)).filter(_ > 0)
    if (rs.isEmpty) 1.0 else clampFactor(rs.max)
  }

  /** Session-typical host factor (MEDIAN basket per class, larger class
    * ratio, clamped): the reported `host_factor`, and the normalizer for
    * the session-spanning throughput rows (replay/admission eps), whose
    * cost accrues across the whole run rather than at one position.
    */
  def sessionFactor(cps: Checkpoints, histCheap: Double,
                    histMid: Double): Double = {
    val rs = Seq(validRatio(medianValid(cps.cheap), histCheap),
      validRatio(medianValid(cps.mid), histMid)).filter(_ > 0)
    if (rs.isEmpty) 1.0 else clampFactor(rs.max)
  }

  /** Host factor at the END of the session — what the second-chance
    * re-measures (which run after the last timed query) adjudicate
    * against.
    */
  def endFactor(cps: Checkpoints, histCheap: Double, histMid: Double): Double =
    localFactor(cps, Int.MaxValue, histCheap, histMid)

  /** Budget for one query under a given host factor. */
  def budget(history: Map[String, Double], name: String,
             factor: Double): Double =
    history.get(name).filter(_ > 0)
      .map(t => factor *
        math.max(math.max(2.0 * t, math.min(TrackedFloorSec, 2.5 * t)),
          MicroFloorSec))
      .getOrElse(FloorSec)

  /** The initial flag pass: names whose reading exceeds their budget at
    * their position-local host factor. `indexed` pairs each (name, sec)
    * with the query's run position.
    */
  def overBudget(indexed: Seq[(String, Double, Int)],
                 history: Map[String, Double], cps: Checkpoints,
                 histCheap: Double, histMid: Double): Seq[String] =
    indexed.collect { case (n, t, i)
      if t > budget(history, n, localFactor(cps, i, histCheap, histMid)) => n }
}
