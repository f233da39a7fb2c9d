package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Melt, SeriesOps}

/** CSV ImportHub ETL (SURVEY.md §2.1 S5/S9/S10/S12, §2.8 F8, §3.3):
  * wide CSV → fuzzy column mapping → melt to canonical long format →
  * cleanse → dedup-keep-first.
  *
  * The fuzzy matcher is DRIVER-side (it maps column NAMES, not data —
  * reference `import_hub_main.py:34-55`, threshold 60/100): token-set
  * scoring over normalized names, pure Scala, no distributed work.
  */
object CsvImport {

  /** Normalize a column label: lowercase, split on non-alphanumerics, strip
    * plural 's' (reference `import_hub_main.py:14-31` normalizes case and
    * separators; stemming stands in for fuzzywuzzy's partial matching).
    */
  def tokens(label: String): Set[String] =
    label.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .map(t => if (t.length > 3 && t.endsWith("s")) t.dropRight(1) else t)
      .toSet

  /** Token-SET similarity in [0, 100], fuzzywuzzy token_set_ratio-style:
    * a full subset scores 100 (100·|A∩B| / min(|A|,|B|)), with a
    * partial-credit term from character overlap of the joined tokens
    * (so `hr` vs `heart_rate` scores > 0).
    */
  def score(a: String, b: String): Int = {
    val (ta, tb) = (tokens(a), tokens(b))
    if (ta.isEmpty || tb.isEmpty) 0
    else {
      val tokenScore = 100.0 * ta.intersect(tb).size / math.min(ta.size, tb.size)
      val (sa, sb) = (ta.toSeq.sorted.mkString, tb.toSeq.sorted.mkString)
      val charScore = 100.0 * lcsLen(sa, sb) / math.max(sa.length, sb.length)
      math.max(tokenScore, 0.6 * charScore).round.toInt
    }
  }

  private def lcsLen(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  /** Best CSV column per target attribute, above `threshold` (default 60 to
    * match the reference); None → unmapped (reference's "None" option).
    */
  def autoMap(csvColumns: Seq[String], targets: Seq[String],
              threshold: Int = 60): Map[String, Option[String]] =
    targets.map { t =>
      val best = csvColumns.map(c => c -> score(c, t)).maxByOption(_._2)
      t -> best.collect { case (c, s) if s >= threshold => c }
    }.toMap

  /** Read a wide CSV with header + schema inference (S5). */
  def readWide(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Wide frame → canonical long series rows for the mapped feature columns:
    * melt, rename to (user_id, timestamp, value), drop non-positive values
    * (P9), dedup keep-first per (user, ts, metric) (U4). `mapping` is
    * featureName → CSV column.
    */
  def toLongSeries(wide: DataFrame, userCsvCol: String, tsCsvCol: String,
                   mapping: Map[String, String]): DataFrame = {
    val renamed = mapping.foldLeft(
      wide.withColumn("user_id", col(userCsvCol).cast("string"))
        .withColumn("timestamp", col(tsCsvCol).cast("timestamp"))) {
      case (df, (feature, csvCol)) => df.withColumn(s"__f_$feature", col(csvCol))
    }
    val long = Melt(renamed.withColumn("__rowpos", monotonically_increasing_id()),
      idCols = Seq("user_id", "timestamp", "__rowpos"),
      valueCols = mapping.keys.toSeq.sorted.map(f => s"__f_$f"))
      .withColumn("metric", regexp_replace(col("metric"), "^__f_", ""))
      .filter(col("value") > 0) // P9 cleanse
    SeriesOps.dedupKeepFirst(long, Seq("user_id", "timestamp", "metric"), "__rowpos")
      .drop("__rowpos")
  }

  /** S12: upsert-new-users — incoming users not already present. */
  def newUsers(incoming: DataFrame, existing: DataFrame, userCol: String): DataFrame =
    graft.ops.CohortFilter.antiJoin(
      incoming.select(col(userCol)).distinct(), existing, userCol)
}
