package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warm-up pass (droppable JVM/codegen/parquet-footer costs) runs first so
  * the timings measure the queries, not first-touch initialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up pass: run every query once untimed so the timed pass measures
    // steady-state execution (codegen compilation and JIT dominate first
    // runs by 3-8×), then time each query.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // Best of 2 timed runs per query (local timing noise is substantial).
    // A failing query records the sentinel -1, NOT its time-to-exception —
    // a broken query must never masquerade as a fast one.
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val failed = results.collect { case (n, t) if t < 0 => n }
    // Per-query budgets for the inherently-expensive queries: regressions
    // above machine noise surface as over_budget entries round-over-round.
    // (Budgets ≈ 2× observed sf0.1 best-of-2, floored at 4 s for noise.)
    val budgets = Map(
      "ann_ivf_cosine" -> 4.0, "traj_similarity_grid" -> 4.0,
      "ann_recall_lsh" -> 4.0, "ann_recall_ivf" -> 4.0,
      "text_decontaminate" -> 8.0, "text_top_ngrams" -> 5.0,
      "dedup_jaccard_exact" -> 5.0, "dedup_containment" -> 5.0,
      "curation_pipeline_e2e" -> 5.0, "dedup_near_duplicates" -> 5.0,
      "dedup_title_edit" -> 4.0, "dedup_clusters" -> 4.0,
      "dedup_survivors" -> 4.0, "w11_interpolate_grid" -> 4.0)
    val overBudget = results.collect {
      case (n, t) if t > budgets.getOrElse(n, Double.MaxValue) => n
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${arr(failed)},"over_budget":${arr(overBudget)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
