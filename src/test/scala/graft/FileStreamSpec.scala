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
