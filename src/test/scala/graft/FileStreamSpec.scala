package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamKpis

/** Production streaming path (SURVEY.md §2.10): `readStream` over an
  * append-only parquet directory (the shape `TableStore.appendSeries`
  * writes), driving the incremental KPI queries — the replacement for the
  * reference's HTTP replay + client-side accumulation.
  */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming parquet sink accumulates small files; compaction restores layout") {
    // The full ingest lifecycle: stream → parquet sink (one file per
    // micro-batch = the small-files problem) → compactParquet → identical
    // data in scan-friendly files.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Double)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Double)]], spark)
    val out = Files.createTempDirectory("graft_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = input.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try {
      (1 to 5).foreach { b =>
        input.addData((1 to 100).map(i => (b * 1000L + i, i * 1.0)))
        q.processAllAvailable()
      }
    } finally q.stop()
    def files = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files >= 5, s"one file per micro-batch expected, got $files")
    graft.sources.TableStore.compactParquet(spark, out,
      targetFileBytes = 1L * 1024 * 1024 * 1024)
    assert(files == 1, s"compaction must leave one file, got $files")
    assert(spark.read.parquet(out).count() == 500)
  }

  test("file-source stream drives sliding-window KPIs incrementally") {
    val dir = Files.createTempDirectory("graft_stream").toString
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

    // Batch 1 lands before the stream starts; batch 2 arrives mid-stream.
    Seq(("u1", ts(0), 10.0), ("u1", ts(1), 20.0), ("u2", ts(2), 30.0))
      .toDF("user_id", "ts", "value")
      .write.mode("append").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamKpis.sliding(stream, "ts", "value",
        window = "2 minutes", slide = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sliding_kpis").start()
    try {
      q.processAllAvailable()
      Seq(("u2", ts(3), 40.0)).toDF("user_id", "ts", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      // 0-second watermark in append mode: only windows the watermark has
      // passed are final. Compare finalized windows to batch recomputation.
      val got = spark.table("sliding_kpis")
        .select("window_start", "avg_value", "n")
        .as[(java.sql.Timestamp, Double, Long)].collect()
        .map(t => t._1.getTime / 60000 -> (t._2, t._3)).toMap
      val all = Seq((0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0))
      got.foreach { case (startMin, (avgGot, nGot)) =>
        val in = all.filter(p => p._1 >= startMin && p._1 < startMin + 2).map(_._2)
        assert(nGot == in.size, s"window @$startMin")
        assert(math.abs(avgGot - in.sum / in.size) < 1e-12, s"window @$startMin")
      }
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
