package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference aggregation — the RLHF-data primitive: turn pairwise
  * "A beat B" judgments (human preferences, model battles, A/B clicks)
  * into per-item strength scores.
  *
  * Reference surface: beyond-reference (training-data pipeline op); the
  * algorithm is the public Bradley–Terry model fitted by Hunter's (2004)
  * MM iteration, the same aggregation behind Chatbot-Arena-style
  * leaderboards.
  */
object Preference {

  /** Bradley–Terry strengths after `rounds` MM iterations:
    * w_i ← W_i / Σ_j n_ij / (w_i + w_j), renormalized to Σ w = 1 each
    * round, where W_i = i's total wins and n_ij = games between i and j
    * (both directions). Fixed iteration count, not convergence detection
    * — the PageRank determinism discipline: every engine runs the
    * identical arithmetic, so the result is oracle-checkable.
    *
    * Numerics: strengths re-quantize to 6 dp every round and both the
    * per-item denominator and the normalizing total fold over
    * VALUE-SORTED terms (the house cross-engine double-sum discipline) —
    * item sets are a bounded report dimension, so the per-item collect
    * is ≤ |items| terms.
    *
    * Scale shape: the game matrix builds in ONE pass over the pairs and
    * is `localCheckpoint`ed for reuse across rounds; each round is two
    * |games|-sized equi joins + one |items|-sized aggregate, with
    * per-round `localCheckpoint` lineage truncation (the iterative-op
    * contract). Zero-win items keep strength 0 (they carry no
    * information for the ratio model); a zero-win pair can never have
    * played each other — their mutual game would have a winner — so the
    * denominator never divides 0 by 0.
    */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 50, "rounds must lie in [1, 50]")
    val p = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).cast("string").as("__i"),
        col(loserCol).cast("string").as("__j"))
    val wins = p.groupBy(col("__i")).agg(count(lit(1)).as("__wins"))
    val games = p
      .unionAll(p.select(col("__j").as("__i"), col("__i").as("__j")))
      .groupBy(col("__i"), col("__j")).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // reused every round
    val items = games.select(col("__i")).distinct()
    val w0 = items.join(wins, Seq("__i"), "left")
      .select(col("__i"), coalesce(col("__wins"), lit(0L)).as("__wins"),
        lit(1.0).as("strength"))
      .localCheckpoint()
    def sortedSum(c: org.apache.spark.sql.Column) =
      aggregate(sort_array(collect_list(c)), lit(0.0), (acc, x) => acc + x)
    val fitted = (1 to rounds).foldLeft(w0) { (cur, _) =>
      val sj = cur.select(col("__i").as("__j"), col("strength").as("__sj"))
      val denom = games
        .join(cur.select(col("__i"), col("strength").as("__si")), Seq("__i"))
        .join(sj, Seq("__j"))
        .select(col("__i"),
          (col("__n").cast("double") / (col("__si") + col("__sj")))
            .as("__term"))
        .groupBy(col("__i"))
        .agg(sortedSum(col("__term")).as("__d"))
      val raw = cur.select(col("__i"), col("__wins"))
        .join(denom, Seq("__i"))
        .select(col("__i"), col("__wins"),
          round(col("__wins").cast("double") / col("__d"), 6).as("__raw"))
      val total = raw.agg(sortedSum(col("__raw")).as("__t"))
      raw.crossJoin(broadcast(total))
        .select(col("__i"), col("__wins"),
          round(col("__raw") / col("__t"), 6).as("strength"))
        .localCheckpoint()
    }
    fitted.select(col("__i").as("item"), col("__wins").as("wins"),
      col("strength"))
  }
}
