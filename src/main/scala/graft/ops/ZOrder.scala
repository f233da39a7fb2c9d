package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the lakehouse layout technique behind Delta's OPTIMIZE ZORDER BY /
  * Hudi clustering, re-expressed as plain Spark relational ops.
  *
  * Why it matters at 100 TB: min/max file stats prune scans only along
  * the physical sort order. A (user, time)-sorted table answers user
  * predicates with tight per-file user ranges but useless value ranges;
  * interleaving the bits of BOTH dimensions into one sort key gives every
  * file a small bounding BOX in (x, y) space, so selective predicates on
  * EITHER dimension skip most files. The curve value is pure map-side
  * integer arithmetic (five shift-mask rounds per dimension — the
  * standard magic-number bit spread), fully inside whole-stage codegen;
  * clustering is one `repartitionByRange` + within-partition sort, the
  * same cost as any other table rewrite.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at even position 2i
    * (magic-number interleave; Long arithmetic throughout).
    */
  def spread16(x: Column): Column = {
    val a = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton value interleaving two 16-bit coordinates: x takes the
    * even bit positions, y the odd ones. Callers quantize raw columns
    * into [0, 65536) first (see [[quantize16]]).
    */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Quantize a numeric column into [0, 65536) against fixed [lo, hi)
    * bounds (clamping outliers into the edge cells). Fixed bounds — not
    * data-derived quantiles — keep the mapping stable across ingest
    * batches, so files written on different days share one curve.
    */
  def quantize16(v: Column, lo: Double, hi: Double): Column = {
    val scaled = floor((v.cast("double") - lit(lo)) * lit(65536.0 / (hi - lo)))
    least(lit(65535L), greatest(lit(0L), scaled.cast("long")))
  }

  /** Rewrite `df` clustered along the z-curve of two quantized columns:
    * range-partition by the curve value (each output partition = one
    * contiguous curve segment = a small bounding box) and sort within
    * partitions so parquet row-group stats are tight too.
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              nPartitions: Int): DataFrame = {
    val z = zValue2(x, y)
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Data-skipping manifest over EXPLICIT curve buckets (the top `bits`
    * bits of the 32-bit z-value stand in for files): per-bucket row count
    * and min/max of both raw dimensions — exactly the stats a scan
    * planner consults to skip files. Deterministic (no dependence on
    * physical partitioning), so it gates against a SQL oracle; the
    * engine-layout variant of the same report backs the spec.
    */
  def skippingManifest(df: DataFrame, x: Column, y: Column,
                       xRaw: Column, yRaw: Column,
                       bits: Int = 8): DataFrame =
    df.select(shiftright(zValue2(x, y), 32 - bits).as("bucket"),
        xRaw.as("__x"), yRaw.as("__y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        round(min(col("__y")), 6).as("y_min"),
        round(max(col("__y")), 6).as("y_max"))
}
