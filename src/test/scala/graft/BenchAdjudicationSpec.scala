package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[BenchAdjudication]]'s invariants (r15 verdict #2): the bench
  * harness's over-budget test must adjudicate a noisy-host session
  * identically to a quiet one under synthetic perturbation, exonerate
  * burst-window readings its sentinels witnessed, and never let the
  * host factor escape [1, cap].
  */
class BenchAdjudicationSpec extends AnyFunSuite {
  import BenchAdjudication._

  // A 60-query session: baskets at positions 0, 20, 40, 60 (end).
  // History: cheap basket sums to 0.30 s, mid sentinel 1.0 s.
  private val histCheap = 0.30
  private val histMid = 1.0
  private val history = Map(
    "q_fast" -> 0.10, "q_mid" -> 1.0, "q_heavy" -> 5.0)
  private def quiet = Checkpoints(Vector(0, 20, 40, 60),
    Vector(0.30, 0.30, 0.30, 0.30), Vector(1.0, 1.0, 1.0, 1.0))

  test("uniform host perturbation adjudicates identically to a quiet session") {
    // Readings: q_fast regressed 3x (must flag), q_mid at 1.5x (fine),
    // q_heavy at 1.1x (fine).
    val readings = Seq(("q_fast", 0.30, 5), ("q_mid", 1.5, 25),
      ("q_heavy", 5.5, 45))
    val flaggedQuiet =
      overBudget(readings, history, quiet, histCheap, histMid)
    assert(flaggedQuiet == Seq("q_fast"))
    // Scale EVERY reading and EVERY basket by 1.8 (a uniformly slow
    // host, within the cap): the flag set must not change — the genuine
    // 3x regression still flags (3x > 2x contract survives any uniform
    // factor), nothing else starts flagging.
    val k = 1.8
    val noisy = Checkpoints(quiet.positions, quiet.cheap.map(_ * k),
      quiet.mid.map(_ * k))
    val flaggedNoisy = overBudget(readings.map { case (n, t, i) => (n, t * k, i) },
      history, noisy, histCheap, histMid)
    assert(flaggedNoisy == flaggedQuiet,
      s"noisy-host session diverged: $flaggedNoisy vs $flaggedQuiet")
  }

  test("a burst the bracketing sentinels witnessed exonerates; quiet brackets still flag") {
    // q_mid reads 2.2x its baseline at position 25. In the quiet session
    // that flags (2.2 > 2x budget)...
    val readings = Seq(("q_mid", 2.2, 25))
    assert(overBudget(readings, history, quiet, histCheap, histMid)
      == Seq("q_mid"))
    // ...but when the baskets bracketing position 25 (the readings at
    // positions 20 and 40) themselves ran 2.3x, the burst is the host's,
    // not the query's — no flag, no retraction churn.
    val burst = Checkpoints(Vector(0, 20, 40, 60),
      Vector(0.30, 0.69, 0.69, 0.30), Vector(1.0, 2.3, 2.3, 1.0))
    assert(overBudget(readings, history, burst, histCheap, histMid).isEmpty)
    // A burst elsewhere in the session (positions 0-20) does NOT
    // exonerate a query at position 45 — only the local window counts.
    val earlyBurst = Checkpoints(Vector(0, 20, 40, 60),
      Vector(0.69, 0.69, 0.30, 0.30), Vector(2.3, 2.3, 1.0, 1.0))
    assert(overBudget(Seq(("q_mid", 2.2, 45)), history, earlyBurst,
      histCheap, histMid) == Seq("q_mid"))
  }

  test("a query is only exonerated by drift its own cost class shows") {
    // Cheap-basket drift alone (job-overhead class) at 2.3x while the
    // mid sentinel (shuffle/agg class) stays quiet: the MAX-of-classes
    // rule still lifts the factor — by design the larger ratio wins so
    // a burst seen by either class exonerates, but a reading outgrowing
    // BOTH classes' drift must flag.
    val cheapOnly = Checkpoints(Vector(0, 20, 40, 60),
      Vector(0.30, 0.69, 0.69, 0.30), Vector(1.0, 1.0, 1.0, 1.0))
    // 2.2x reading: exonerated (cheap class saw 2.3x -> factor 2.3).
    assert(overBudget(Seq(("q_mid", 2.2, 25)), history, cheapOnly,
      histCheap, histMid).isEmpty)
    // 5x reading: outgrows every witnessed drift -> flags even here.
    assert(overBudget(Seq(("q_mid", 5.0, 25)), history, cheapOnly,
      histCheap, histMid) == Seq("q_mid"))
  }

  test("factor clamps to [1, cap]: fast hosts never tighten, slow hosts never fully exonerate") {
    // Baskets at HALF their baseline (a faster-than-baseline host):
    // factor stays 1.0 — the 2x contract never tightens below itself.
    val fast = Checkpoints(Vector(0, 60), Vector(0.15, 0.15),
      Vector(0.5, 0.5))
    assert(localFactor(fast, 30, histCheap, histMid) == 1.0)
    // Baskets at 5x: factor clamps at the cap, so a 5x-over reading on
    // a 5x host STILL flags (a catastrophic host can't hide a genuine
    // regression of the same magnitude).
    val awful = Checkpoints(Vector(0, 60), Vector(1.5, 1.5),
      Vector(5.0, 5.0))
    assert(localFactor(awful, 30, histCheap, histMid) == FactorCap)
    assert(overBudget(Seq(("q_mid", 10.1, 30)), history, awful,
      histCheap, histMid) == Seq("q_mid"))
  }

  test("degenerate inputs fall back safely") {
    // No history for the sentinels -> factor 1.0, raw budgets.
    assert(localFactor(quiet, 10, -1.0, -1.0) == 1.0)
    // Failed basket readings (-1) are skipped, not divided by.
    val holes = Checkpoints(Vector(0, 20, 40, 60),
      Vector(-1.0, 0.45, -1.0, 0.30), Vector(-1.0, -1.0, -1.0, -1.0))
    assert(localFactor(holes, 25, histCheap, histMid) == 1.5)
    // A query with no history entry keeps the 4 s first-measurement
    // floor regardless of host state.
    assert(budget(history, "q_new", 2.5) == FloorSec)
    assert(overBudget(Seq(("q_new", 3.9, 5)), history, quiet, histCheap,
      histMid).isEmpty)
    // End factor reads the last checkpoint pair.
    val tailBurst = Checkpoints(Vector(0, 20, 40, 60),
      Vector(0.30, 0.30, 0.30, 0.60), Vector(1.0, 1.0, 1.0, 1.0))
    assert(endFactor(tailBurst, histCheap, histMid) == 2.0)
  }
}
