package graft

import java.util.Locale

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure / spill stress harness (r15 verdict #1): the one leg of
  * the 100 TB claim the plan audits could not cover — what happens when a
  * partition does NOT fit in execution memory. Runs the heaviest sf1
  * operator families in a deliberately CONSTRAINED session (small heap via
  * SPARK_DRIVER_MEM, `spark.memory.fraction` cut to a sliver, few/large
  * shuffle partitions) and records, per query: wall seconds, bytes spilled
  * to memory/disk, the max per-task execution-memory peak, and completion.
  *
  * The pass criterion is NOT "no spill" — at 100 TB spill is the design's
  * safety valve, and a healthy operator under pressure COMPLETES WITH
  * SPILL (Spark's sort/agg/join operators degrade to external sort
  * gracefully when the plan shape is right). The failure modes this
  * harness exists to surface are OOM death, driver-side materialization
  * of corpus-sized data (would OOM the 4g heap instantly), and runaway
  * wall time from eviction churn. Results land in SCALE.md's round-16
  * table.
  *
  * Per-query JSON lines print (and flush) IMMEDIATELY after each query so
  * a genuine OOM later in the list still leaves the completed rows'
  * evidence in the log.
  *
  * Env: SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_CPUS (local[N], default
  * 8), SPARK_GRAFT_MEMORY_FRACTION (default 0.2 — of a 4g heap that is
  * ~740 MB of unified execution+storage memory shared by 8 task slots),
  * SPARK_GRAFT_SHUFFLE (shuffle partitions, default 8 — few and LARGE, the
  * stress shape), SPARK_GRAFT_ONLY (query-name filter). Heap comes from
  * build.sbt's forked-JVM -Xmx via SPARK_DRIVER_MEM (tools/spill_stress.sh
  * sets 4g).
  */
object SpillStress {

  /** Task-end spill accounting, accumulated across every stage of the
    * currently-running query and snapshot/reset between queries. Task-end
    * events are posted to the listener bus asynchronously; the snapshot
    * waits a beat after each query action returns (diagnostic harness —
    * a sub-second tail straggler would only ever UNDERCOUNT spill, never
    * invent it).
    */
  private final class SpillListener extends SparkListener {
    private var memSpilled = 0L
    private var diskSpilled = 0L
    private var peakTaskMem = 0L
    private var tasks = 0L
    private var failedTasks = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null) {
        memSpilled += m.memoryBytesSpilled
        diskSpilled += m.diskBytesSpilled
        peakTaskMem = math.max(peakTaskMem, m.peakExecutionMemory)
      }
      tasks += 1
      if (!t.taskInfo.successful) failedTasks += 1
    }
    def snapshotAndReset(): (Long, Long, Long, Long, Long) = synchronized {
      val s = (memSpilled, diskSpilled, peakTaskMem, tasks, failedTasks)
      memSpilled = 0L; diskSpilled = 0L; peakTaskMem = 0L
      tasks = 0L; failedTasks = 0L
      s
    }
  }

  /** The sf1 headliners named by the r15 verdict: the heaviest family
    * representative per candidate-generation shape (relational LSH,
    * one-pass KM LSH, engaged-cap containment under planted skew, IVF-PQ
    * serve, iterative graph lineage, corpus-join decontamination, and the
    * composed incremental-corpus session).
    */
  private val DefaultQueries = Seq(
    "dedup_lsh_planned", "dedup_lsh_planned_onepass",
    "skew_stress_containment", "ann_ivfpq", "graph_ppr",
    "text_decontaminate", "e2e_incremental_session")

  private def jnum(v: Double, digits: Int): String =
    String.format(Locale.ROOT, s"%.${digits}f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1_derived")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val memFraction = sys.env.getOrElse("SPARK_GRAFT_MEMORY_FRACTION", "0.2")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = shuffle)
      .config("spark.memory.fraction", memFraction)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"harness":"spill_stress","sf":"$sfDir","heap_mb":$heapMb,""" +
      s""""memory_fraction":$memFraction,"shuffle_partitions":$shuffle,""" +
      s""""cpus":$cpus}""")

    def release(): Unit = {
      graft.ops.OpCaches.releaseAll(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(rdd => try rdd.unpersist(blocking = true)
          catch { case _: Throwable => () })
      System.gc()
    }

    val rows = only.map { name =>
      val row = SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[spill] WARNING: unknown query name '$name'")
          (name, -1.0, 0L, 0L, 0L, 0L, 0L, "unknown query")
        case Some(fn) =>
          release()
          listener.snapshotAndReset()
          val t0 = System.nanoTime()
          val err = try { fn(spark, sfDir).count(); "" }
            catch { case e: Throwable =>
              (e.getClass.getSimpleName + ": " +
                String.valueOf(e.getMessage).take(200))
                .replaceAll("[\"\\\\\n\r]", " ")
            }
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(800) // let async task-end events drain
          val (mem, disk, peak, tasks, failed) = listener.snapshotAndReset()
          (name, if (err.isEmpty) sec else -1.0, mem, disk, peak, tasks,
            failed, err)
      }
      val (n, sec, mem, disk, peak, tasks, failed, err) = row
      println(s"""{"query":"$n","sec":${jnum(sec, 2)},""" +
        s""""spill_mem_mb":${mem / (1024 * 1024)},""" +
        s""""spill_disk_mb":${disk / (1024 * 1024)},""" +
        s""""peak_task_mem_mb":${peak / (1024 * 1024)},""" +
        s""""tasks":$tasks,"failed_tasks":$failed,"err":"$err"}""")
      Console.out.flush()
      row
    }
    val died = rows.count(_._2 < 0)
    val spilled = rows.count(r => r._3 + r._4 > 0)
    println(s"""{"metric":"spill_stress","queries":${rows.size},""" +
      s""""completed":${rows.size - died},"errored":$died,""" +
      s""""spilled":$spilled,"total_sec":${jnum(rows.map(_._2).filter(_ > 0).sum, 1)}}""")
    spark.stop()
  }
}
