package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming scale probe (SCALE.md "streaming e2e"): drives the full
  * replay → within-watermark dedup → quality → novelty-store pipeline —
  * the composition StreamingSpec proves correct at fixture scale — over an
  * arbitrary documents corpus, and reports the two numbers that decide
  * whether the design survives a 10× corpus: per-micro-batch latency
  * (should be flat — each batch's work is O(batch), not O(history)) and
  * the Spark state-store row count (should be bounded by the watermark
  * horizon — `dropDuplicatesWithinWatermark` evicts passed keys — never
  * O(stream length)).
  *
  * Usage: runMain graft.StreamProbe <corpusDir> <workDir> [nBatches]
  * Prints ONE JSON line with per-batch timings and state-store telemetry.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    if (args.length > 3 && args(3) == "softdedup") { probeSoftDedup(args); return }
    probeCuration(args)
  }

  /** Soft-dedup ingest probe (L154 at scale): replay the corpus in
    * event-time batches; per batch merge into the cluster store via the
    * PRE-SHINGLED path (the production shape — history is never
    * re-tokenized) and append the batch's shingles. Reports per-batch
    * latency (the O(store-shingle-scan) cross-probe term should grow
    * sub-linearly thanks to the df cap and columnar scan, never like
    * re-tokenizing history) and final cluster telemetry.
    *
    * Usage: runMain graft.StreamProbe <corpusDir> <workDir> <nBatches> softdedup
    */
  private def probeSoftDedup(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val nBatches = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rawDir = s"$workDir/raw"
    val shingleDir = s"$workDir/shingles"
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    docs.withColumn("ts",
        timestamp_micros(pmod(col("doc_id"), lit(nBatches.toLong)) *
          lit(60L * 1000 * 1000)))
      .write.mode("overwrite").parquet(rawDir)
    var storePath = s"$workDir/store_init"
    Seq.empty[(Long, Long, String)].toDF("doc_id", "cluster_id", "text")
      .write.mode("overwrite").parquet(storePath)
    Seq.empty[(Long, String)].toDF("doc_id", "shingle")
      .write.mode("overwrite").parquet(shingleDir)

    val stream = spark.readStream
      .format(classOf[graft.streaming.ReplayStreamSource].getName)
      .option("path", rawDir).option("tsCol", "ts")
      .option("timestampsPerTrigger", "1")
      .load()
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = stream.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        val t0 = System.nanoTime()
        if (!b.isEmpty) {
          val store = spark.read.parquet(storePath)
          val shingles = spark.read.parquet(shingleDir)
          val updated = graft.streaming.StreamDedup.softDedupIngestPreShingled(
            store, shingles, b.select(col("doc_id"), col("text")),
            "doc_id", "text", minJaccard = 0.8)
          val next = s"$workDir/store_v$id"
          updated.write.mode("overwrite").parquet(next)
          graft.ops.Dedup.shingleSets(b.toDF(), "doc_id", "text")
            .write.mode("append").parquet(shingleDir)
          graft.ops.OpCaches.releaseAll()
          storePath = next
        }
        batchMs += (System.nanoTime() - t0) / 1000000
        ()
      }
      .start()
    val t0 = System.nanoTime()
    try q.processAllAvailable() finally q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9
    val store = spark.read.parquet(storePath)
    val nDocs = store.count()
    val nClusters = store.select("cluster_id").distinct().count()
    val maxCluster = store.groupBy("cluster_id").count()
      .agg(max("count")).as[Long].first()
    val nonEmpty = batchMs.filter(_ > 0).toSeq
    def msStats(xs: Seq[Long]) =
      if (xs.isEmpty) (0L, 0L, 0L)
      else (xs.sum / xs.size, xs.sorted.apply(xs.size / 2), xs.max)
    val (meanMs, medMs, maxMs) = msStats(nonEmpty)
    // First vs last batch latency: the growth signature of the
    // O(shingle-store) cross-probe term.
    val firstMs = nonEmpty.headOption.getOrElse(0L)
    val lastMs = nonEmpty.lastOption.getOrElse(0L)
    println(s"""{"metric":"softdedup_probe","corpus":"$corpusDir",""" +
      s""""batches":${nonEmpty.size},"rows_in":${docs.count()},""" +
      s""""store_docs":$nDocs,"clusters":$nClusters,""" +
      s""""max_cluster":$maxCluster,""" +
      s""""batch_ms_mean":$meanMs,"batch_ms_median":$medMs,""" +
      s""""batch_ms_max":$maxMs,"batch_ms_first":$firstMs,""" +
      s""""batch_ms_last":$lastMs,"total_sec":$totalSec}""")
    spark.stop()
  }

  private def probeCuration(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val workDir = args(1)
    val nBatches = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).config("spark.sql.streaming.numRecentProgressUpdates", "400")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rawDir = s"$workDir/raw"
    val storeDir = s"$workDir/store"
    val curatedDir = s"$workDir/curated"
    // Event times derived from doc_id: nBatches distinct minutes → with
    // timestampsPerTrigger=1 the replay source serves exactly one minute
    // per micro-batch, so every batch carries ~1/nBatches of the corpus.
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    docs.withColumn("ts",
        timestamp_micros(pmod(col("doc_id"), lit(nBatches.toLong)) *
          lit(60L * 1000 * 1000)))
      .write.mode("overwrite").parquet(rawDir)
    // Seed store: 10% of hashes pre-curated, so the novelty anti-join has
    // a nonempty static side from batch one.
    docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(md5(col("text")).as("content_hash"))
      .write.mode("overwrite").parquet(storeDir)

    val stream = spark.readStream
      .format(classOf[graft.streaming.ReplayStreamSource].getName)
      .option("path", rawDir).option("tsCol", "ts")
      .option("timestampsPerTrigger", "1")
      .load()
    // Within-stream exact dedup with bounded state (2-minute horizon on a
    // 1-minute batch cadence), then per-batch quality + novelty + store
    // absorb — same shape as the StreamingSpec e2e gate.
    val deduped = graft.streaming.StreamDedup.exactWithinWatermark(
      graft.streaming.StreamDedup.withContentHash(stream, "text"),
      "ts", Seq("content_hash"), watermark = "2 minutes")
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = deduped.writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val t0 = System.nanoTime()
        if (!b.isEmpty) {
          val store = spark.read.parquet(storeDir)
          val novel = graft.streaming.StreamDedup
            .novelAgainstStore(
              b.withColumn("q_len", least(lit(1.0),
                size(split(trim(col("text")), " ")) / lit(50.0)))
                .filter(col("q_len") >= 0.1),
              store, Seq("content_hash"))
            .cache()
          novel.select("doc_id", "ts", "text")
            .write.mode("append").parquet(curatedDir)
          novel.select("content_hash").write.mode("append").parquet(storeDir)
          novel.unpersist()
        }
        batchMs += (System.nanoTime() - t0) / 1000000
        ()
      }
      .start()
    val t0 = System.nanoTime()
    try q.processAllAvailable() finally q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9

    // State telemetry from the progress log: rows held by
    // dropDuplicatesWithinWatermark per trigger (bounded ⇔ max ≈ rows in
    // one watermark horizon, not the cumulative stream).
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsTotal)
    val curated = spark.read.parquet(curatedDir).count()
    val storeRows = spark.read.parquet(storeDir).count()
    val nonEmpty = batchMs.filter(_ > 0)
    def msStats(xs: Seq[Long]) =
      if (xs.isEmpty) (0L, 0L, 0L)
      else (xs.sum / xs.size, xs.sorted.apply(xs.size / 2), xs.max)
    val (meanMs, medMs, maxMs) = msStats(nonEmpty.toSeq)
    println(s"""{"metric":"stream_probe","corpus":"$corpusDir",""" +
      s""""batches":${nonEmpty.size},"rows_in":${docs.count()},""" +
      s""""curated_rows":$curated,"store_rows":$storeRows,""" +
      s""""batch_ms_mean":$meanMs,"batch_ms_median":$medMs,""" +
      s""""batch_ms_max":$maxMs,"state_rows_max":${
        if (stateRows.isEmpty) 0 else stateRows.max},""" +
      s""""total_sec":$totalSec}""")
    spark.stop()
  }
}
