package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.ops.CohortFilter
import graft.query.QueryEngine
import graft.sources.TableStore

/** Integration: GeoMTS fixtures written through the bucketed TableStore
  * sinks, then the QueryEngine runs over the STORED tables (the production
  * read path), and results equal running over the in-memory frames.
  */
class StorageEngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("engine over bucketed storage equals engine over in-memory frames") {
    val subjects = Fixtures.users.toDF()
    val hr = Fixtures.heartRates.toDF("user_id", "timestamp", "value")

    TableStore.createDatabase(spark, "graft_int")
    spark.sql("DROP TABLE IF EXISTS graft_int.heart_rates")
    spark.sql("DROP TABLE IF EXISTS graft_int.subjects")
    TableStore.appendSeries(hr, "graft_int.heart_rates", "user_id", "timestamp",
      buckets = 8)
    TableStore.appendSubjects(subjects, "graft_int.subjects")

    val spec = QuerySpec(
      subjectSelection = ByAttributes(Seq(
        CohortFilter.NumericRange("age", 25, 55, nullOk = false))),
      controlSelection = AllUsers,
      startDate = "2016-08-01", endDate = "2016-08-02")

    def kpis(sub: org.apache.spark.sql.DataFrame, ser: org.apache.spark.sql.DataFrame) =
      QueryEngine.run(spec, sub, ser, "user_id", "timestamp", "value")
        .kpis.head()

    val stored = kpis(spark.table("graft_int.subjects"),
      spark.table("graft_int.heart_rates"))
    val direct = kpis(subjects, hr)

    // avgs: summation order differs between the bucketed and in-memory
    // partitionings → ulp-level drift is expected; min/max/counts are exact.
    Seq("subj_avg", "ctrl_avg").foreach { c =>
      assert(math.abs(stored.getAs[Double](c) - direct.getAs[Double](c)) < 1e-9, c)
    }
    Seq("subj_min", "subj_max").foreach { c =>
      assert(stored.getAs[Double](c) == direct.getAs[Double](c), c)
    }
    Seq("subj_rows", "ctrl_rows").foreach { c =>
      assert(stored.getAs[Long](c) == direct.getAs[Long](c), c)
    }
    assert(stored.getAs[Long]("subj_rows") > 0)
  }

  test("join of two co-bucketed tables runs with ZERO exchange") {
    // The co-located-join story: both sides bucketed by the join key at
    // write time → the join consumes the bucketing and shuffles NOTHING.
    // At 100 TB this is the difference between a full-corpus exchange per
    // join and none.
    val hr = Fixtures.heartRates.toDF("user_id", "timestamp", "value")
    val cal = Fixtures.heartRates.map(t => (t._1, t._2, t._3 * 2))
      .toDF("user_id", "timestamp", "value2")
    TableStore.createDatabase(spark, "graft_int")
    spark.sql("DROP TABLE IF EXISTS graft_int.hr_a")
    spark.sql("DROP TABLE IF EXISTS graft_int.hr_b")
    TableStore.appendSeries(hr, "graft_int.hr_a", "user_id", "timestamp", buckets = 8)
    TableStore.appendSeries(cal, "graft_int.hr_b", "user_id", "timestamp", buckets = 8)

    // Join on the BUCKET key (user_id): per-user profile joined to the
    // series. Disable auto-broadcast so the plan must actually consume the
    // bucketing (a broadcast would trivially have no shuffle).
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val perUser = spark.table("graft_int.hr_b")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.avg("value2").as("avg2"))
      val joined = spark.table("graft_int.hr_a").join(perUser, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle either side:\n${plan.take(1200)}")
      assert(joined.count() == hr.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("per-user aggregation over the bucketed table runs with ZERO exchange") {
    // The SCALE.md claim made checkable: when the table's bucketing matches
    // the grouping key, the user exchange disappears — the one-time shuffle
    // paid at write time is amortized over every later per-user operator.
    val hr = Fixtures.heartRates.toDF("user_id", "timestamp", "value")
    TableStore.createDatabase(spark, "graft_int")
    spark.sql("DROP TABLE IF EXISTS graft_int.hr_bucketed")
    TableStore.appendSeries(hr, "graft_int.hr_bucketed", "user_id", "timestamp",
      buckets = 8)

    val agg = spark.table("graft_int.hr_bucketed")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.avg("value"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed scan must satisfy the grouping distribution:\n${plan.take(1000)}")
    assert(agg.count() == Fixtures.heartRates.map(_._1).distinct.size)
  }

  test("IVF-cluster-partitioned embedding store prunes partitions on probe") {
    // The SCALE.md IVF claim made checkable end-to-end: store the corpus
    // partitioned by assigned cluster id; a probe restricted to one
    // cluster must show a PartitionFilter and scan only that partition's
    // files — at 100 TB this is "the corpus is mostly NOT read".
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val emb = (0 until 30).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i % 3) * 10 + j * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.kmeansFit(emb, "vec_id", "embedding", k = 3, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_store").toString
    Similarity.ivfAssign(emb, "vec_id", "embedding", idx)
      .join(emb, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)

    val probed = spark.read.parquet(dir).filter(col("cluster") === 0)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cluster"),
      s"cluster predicate must prune partitions, not filter rows:\n${plan.take(900)}")
    val clusters = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("cluster="))
    assert(clusters >= 2, s"fixture must produce multiple partitions: $clusters")
    assert(probed.count() > 0)
  }
}
