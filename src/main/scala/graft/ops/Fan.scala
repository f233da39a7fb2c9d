package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan fan-out for single-file inputs (guide §2.5 "input skew" / §6).
  *
  * A parquet scan parallelizes at ROW-GROUP granularity: a table written
  * as one file with one row group yields exactly one non-empty scan split
  * no matter how many byte-range splits the planner cuts, so every
  * map-side stage above it runs single-threaded. The driver's testdata is
  * exactly that shape (one file, one row group per table) — measured at
  * sf0.1: `text_decontaminate`'s shingle+bloom+join-partial stage was ONE
  * task of 5.9 s wall with 31 cores idle.
  *
  * [[out]] round-robin-repartitions to the session's default parallelism
  * — but ONLY when the frame reads from at most 2 underlying files, so a
  * production multi-file table (whose scan already fans out naturally)
  * never pays an extra corpus-wide exchange. The repartition is inside
  * the query (recomputed every run — no cross-run precomputation), and
  * callers must be order-independent downstream: integer-count /
  * min-max / sorted-fold aggregations only, never a raw float sum whose
  * partial order the repartition would perturb (the oracle compare is
  * bitwise on floats).
  */
object Fan {

  /** Fan a narrow single-file scan out to the session's parallelism;
    * identity for multi-file inputs, for frames that report NO input files
    * (in-memory / streaming micro-batch frames — already parallel, an
    * unconditional round-robin exchange would be pure cost), and when the
    * layout can't be read.
    */
  def out(df: DataFrame): DataFrame = {
    val nFiles = try df.inputFiles.length
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (nFiles >= 1 && nFiles <= 2)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
  }
}
