package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DataQuality, Stats}

/** Per-micro-batch SOURCE ADMISSION CONTROL (L292): the batch curation
  * admission gate (curation_pipeline_v6's Wilson-quality ∧ PSI-drift
  * composite) evaluated against each arriving micro-batch inside
  * `foreachBatch`, BEFORE the novelty gate — the shape a 100 TB ingest
  * actually runs: a drifted crawl snapshot or a source gone low-quality is
  * rejected wholesale at the batch boundary, instead of its documents
  * individually limping through the per-document gates downstream.
  *
  * Scale/state design: the reference snapshot is a STATIC frame (the
  * curated corpus's profile — a stream-static join side, re-read or pinned
  * per batch by the caller); everything derived here is |sources|-bounded.
  * Inside `foreachBatch`, call `graft.ops.OpCaches.releaseAll()` once the
  * batch's outputs are materialized — psiByGroup registers scoped caches
  * that would otherwise accumulate across batches.
  */
object StreamAdmission {

  /** |sources|-bounded verdict frame for ONE micro-batch: per source, the
    * batch's row count, the Wilson 95% lower bound of the `quality` share,
    * the PSI drift of `valueCol` vs the reference snapshot, and the
    * admission verdict (wilson_lo ≥ minWilsonLo ∧ psi ≤ maxPsi). Sources
    * present in the reference but absent from the batch yield no row
    * (nothing to admit); sources present only in the batch get
    * maximal-drift PSI from psiByGroup's dense grid — absence of reference
    * evidence reads as drift, never as a free pass.
    */
  def admissionReport(batch: DataFrame, reference: DataFrame,
                      groupCol: String, valueCol: String, quality: Column,
                      minWilsonLo: Double, maxPsi: Double,
                      bins: Int = 10): DataFrame = {
    val wil = DataQuality.wilsonShare(batch, groupCol, quality)
      .select(col(groupCol), col("n"), col("wilson_lo"))
    val drift = Stats.psiByGroup(reference, batch, valueCol, groupCol, bins)
    wil.join(drift, Seq(groupCol))
      .select(col(groupCol), col("n"), col("wilson_lo"), col("psi"),
        (col("wilson_lo") >= minWilsonLo && col("psi") <= maxPsi)
          .as("admitted"))
  }

  /** The micro-batch filtered to rows of admitted sources: a broadcast
    * left-semi join on the |sources|-bounded verdict frame — per-batch
    * cost is one pass over the batch plus one over the reference (for the
    * PSI bins), with no per-document state.
    */
  def admit(batch: DataFrame, reference: DataFrame, groupCol: String,
            valueCol: String, quality: Column, minWilsonLo: Double,
            maxPsi: Double, bins: Int = 10): DataFrame = {
    val ok = admissionReport(batch, reference, groupCol, valueCol, quality,
        minWilsonLo, maxPsi, bins)
      .filter(col("admitted")).select(col(groupCol))
    batch.join(broadcast(ok), Seq(groupCol), "left_semi")
  }

  /** [[admissionReport]] with the drift arm swapped to the binning-free
    * two-snapshot KS statistic (curation v7's streaming form): per
    * source, D = sup |ECDF_ref − ECDF_batch| over `valueCol`. No binning
    * sensitivity, exact integer ECDF arithmetic; the per-group grid is
    * the distinct (source, value) pairs of the reference plus the batch
    * — bounded by the reference's distinct values per source, never a
    * global cross join.
    */
  def admissionReportKs(batch: DataFrame, reference: DataFrame,
                        groupCol: String, valueCol: String, quality: Column,
                        minWilsonLo: Double, maxKs: Double): DataFrame = {
    val wil = DataQuality.wilsonShare(batch, groupCol, quality)
      .select(col(groupCol), col("n"), col("wilson_lo"))
    val drift = Stats.ksByGroup(reference, batch, valueCol, groupCol)
    wil.join(drift.select(col(groupCol), col("ks")), Seq(groupCol))
      .select(col(groupCol), col("n"), col("wilson_lo"), col("ks"),
        (col("wilson_lo") >= minWilsonLo && col("ks") <= maxKs)
          .as("admitted"))
  }

  /** [[admit]] under the KS drift arm. */
  def admitKs(batch: DataFrame, reference: DataFrame, groupCol: String,
              valueCol: String, quality: Column, minWilsonLo: Double,
              maxKs: Double): DataFrame = {
    val ok = admissionReportKs(batch, reference, groupCol, valueCol,
        quality, minWilsonLo, maxKs)
      .filter(col("admitted")).select(col(groupCol))
    batch.join(broadcast(ok), Seq(groupCol), "left_semi")
  }
}
