package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The METs derivation pipeline — the semantic heart of the reference
  * (`viz.py:71-100` `calculate_mets`; SURVEY.md §2.5 J2 + W1–W4).
  *
  * Stages, each preserved bit-for-bit from the reference semantics:
  *   1. J2  weight lookup join with 70 kg default (`viz.py:74-78`);
  *   2. W1  unit conversion `value * 4.186 / weight` (kcal→kJ/kg);
  *   3. W2  per-user mean calibration — scale so each user's mean is 1.0
  *          (`viz.py:89-90`);
  *   4. W3  elapsed days since the user's first sample (`viz.py:87,92`);
  *   5. W4  gap nulling — null the value when the gap TO THE NEXT sample
  *          exceeds `gapDays` (pandas `diff().shift(-1)` = forward diff,
  *          `viz.py:93`).
  *
  * Scale shape: one broadcast join (weights are one row per user) plus ONE
  * shuffle by user — the unordered per-user aggregates (avg, min) and the
  * ordered lead() all share `Window.partitionBy(user)`, so Catalyst plans a
  * single exchange; nothing is collected to the driver.
  */
object Mets {

  val KcalToKj = 4.186
  val DefaultWeightKg = 70.0

  /** @param series  long-format (user, ts, value) calorie series
    * @param weights (user, weight) lookup — one row per user
    */
  def calculate(series: DataFrame, weights: DataFrame,
                userCol: String, tsCol: String, valueCol: String,
                weightCol: String = "weight", gapDays: Double = 0.5,
                tiebreak: Option[String] = None): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
    // Deterministic ordering under timestamp ties: lead() is order-sensitive.
    val orderCols = col(tsCol) +: tiebreak.map(col).toSeq
    val ordered = byUser.orderBy(orderCols: _*)

    val withWeight = series
      .join(broadcast(weights), Seq(userCol), "left")
      .withColumn("__w", coalesce(col(weightCol), lit(DefaultWeightKg)))

    val mets = withWeight
      .withColumn("__raw", col(valueCol) * lit(KcalToKj) / col("__w"))
      // W2: calibrate per-user mean to 1.0
      .withColumn("__cal", col("__raw") / avg(col("__raw")).over(byUser))
      // W3: fractional days since user's first sample (µs-exact arithmetic)
      .withColumn(
        "days_since_start",
        (unix_micros(col(tsCol)) - min(unix_micros(col(tsCol))).over(byUser)) / lit(86400e6))
      // W4: forward-gap nulling: lead(days) − days > gapDays ⇒ null
      .withColumn(
        "mets",
        when(lead(col("days_since_start"), 1).over(ordered) - col("days_since_start") > gapDays,
          lit(null).cast("double"))
          .otherwise(col("__cal")))

    mets.drop("__w", "__raw", "__cal")
  }
}
