package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) write layout: cluster a table on the interleaved
  * bits of two quantized sort keys so that BOTH columns' parquet
  * min/max footers stay tight in every file — the data-layout trick
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`) that lets a scan with a
  * predicate on EITHER dimension skip most files, where a plain sort
  * only prunes its leading column.
  *
  * Pipeline shape at scale: one exact min/max aggregate (driver
  * scalars), then a pure codegen'd projection computes the z-value —
  * quantize each dimension to `bits` bits against its range, interleave
  * a-bits into even positions and b-bits into odd — and
  * `repartitionByRange(z)` + in-partition sort produces files whose
  * z-ranges are disjoint. No shuffle beyond the one the layout write
  * itself requires.
  *
  * The quantize + interleave arithmetic is plain integer/double ops
  * mirrored verbatim in oracle SQL (identical op order ⇒ identical IEEE
  * doubles ⇒ identical buckets in both engines). A constant dimension
  * (max == min) quantizes to 0 everywhere rather than dividing by zero;
  * NULL in either dimension yields a NULL z-value (sorted first, so
  * null rows cluster in one file rather than scattering). */
object ZOrderLayout {

  /** Quantize `x` against [mn, mx] to `bits` bits: floor((x−mn)·2^bits/
    * (mx−mn)) clamped to 2^bits−1. Op order is fixed and mirrored in
    * the oracle. */
  private[operators] def quantize(x: Column, mn: Double, mx: Double, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    if (mx <= mn) lit(0L)
    else least(
      floor((x.cast("double") - lit(mn)) * lit(cells) / lit(mx - mn)).cast("long"),
      lit((1L << bits) - 1))
  }

  /** Morton-interleave two `bits`-bit quantized values: a → even bit
    * positions, b → odd. A sum of 2·bits shift-mask terms — all inside
    * whole-stage codegen, and expressible identically in SQL. */
  private def interleave(qa: Column, qb: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(qa, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(qb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The exact per-column bounds, one aggregate job. */
  def bounds(df: DataFrame, colA: String, colB: String): (Double, Double, Double, Double) = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Attach the z-value of (colA, colB) as `zCol`. */
  def assign(df: DataFrame, colA: String, colB: String, bits: Int = 8,
      zCol: String = "z"): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val (aMn, aMx, bMn, bMx) = bounds(df, colA, colB)
    val z = interleave(
      quantize(col(colA), aMn, aMx, bits),
      quantize(col(colB), bMn, bMx, bits), bits)
    df.withColumn(zCol,
      when(col(colA).isNotNull && col(colB).isNotNull, z)
        .otherwise(lit(null).cast("long")))
  }

  /** Range-partition on the z-value and sort within partitions — the
    * frame to hand `.write`: each output file covers a disjoint z-range,
    * i.e. a tight rectangle in (colA, colB) space. */
  def layout(df: DataFrame, colA: String, colB: String, bits: Int = 8,
      nFiles: Int = 0, zCol: String = "z"): DataFrame = {
    val withZ = assign(df, colA, colB, bits, zCol)
    val parted = if (nFiles > 0) withZ.repartitionByRange(nFiles, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    parted.sortWithinPartitions(col(zCol))
  }

  /** File-skipping effectiveness of the z-order layout — the planner
    * question a 100 TB table owner asks BEFORE rewriting it: per
    * output file, the parquet-footer surrogate (row count + min/max of
    * both dimensions) and whether a scan with the query box
    * [aLo,aHi]×[bLo,bHi] would have to read it (footer ranges overlap
    * the box on BOTH dims). Files are the 4^bits z-space cut into
    * `nFiles` equal-WIDTH slices — a deterministic, engine-mirrorable
    * stand-in for `repartitionByRange`'s sampled boundaries (same
    * clustering geometry, reproducible file ids); NULL-z rows (a NULL
    * in either dimension) are excluded, exactly as they'd sit in a
    * separate nulls-first file. One projection + one aggregate over
    * nFiles groups. */
  def pruningStats(df: DataFrame, colA: String, colB: String,
      bits: Int, nFiles: Int,
      aLo: Double, aHi: Double, bLo: Double, bHi: Double): DataFrame = {
    require(nFiles >= 1 && nFiles <= (1L << (2 * bits)),
      "need 1 <= nFiles <= 4^bits")
    val zSpace = 1L << (2 * bits)
    assign(df, colA, colB, bits)
      .filter(col("z").isNotNull)
      .withColumn("file_id",
        expr(s"(z * ${nFiles.toLong}) div $zSpace"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(colA).cast("double")).as("min_a"),
        max(col(colA).cast("double")).as("max_a"),
        min(col(colB).cast("double")).as("min_b"),
        max(col(colB).cast("double")).as("max_b"))
      .withColumn("scanned",
        col("min_a") <= aHi && col("max_a") >= aLo &&
          col("min_b") <= bHi && col("max_b") >= bLo)
  }

}

/** HILBERT-curve write layout — [[ZOrderLayout]]'s sibling with the
  * locality-tighter curve: consecutive Hilbert indexes are ALWAYS
  * grid-adjacent (Morton order takes long diagonal jumps at quadrant
  * boundaries), so equal-width index slices are tighter rectangles
  * and a box predicate scans fewer files — the reason Databricks
  * liquid clustering moved off Z-order. Index = the classical
  * iterative xy2d walk (quadrant digit + reflect-and-swap rotation
  * per bit, high to low). On the Spark side this is ONE codegen'd
  * [[graft.expressions.HilbertIndex]] Catalyst expression running the
  * per-bit loop imperatively per row (the chained-projection form was
  * abandoned for the measured ~3^bits CollapseProject substitution
  * blowup; PlanAuditSpec pins the single-expression plan); only the
  * DuckDB oracle mirrors the walk as `bits` unrolled SQL CASE stages.
  * Same NULL and constant-dimension contracts as
  * [[ZOrderLayout.assign]]. */
object HilbertLayout {

  def assign(df: DataFrame, colA: String, colB: String, bits: Int = 8,
      hCol: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 15, "bits in [1, 15]")
    val (aMn, aMx, bMn, bMx) = ZOrderLayout.bounds(df, colA, colB)
    val h = graft.expressions.HilbertIndex(
      ZOrderLayout.quantize(col(colA), aMn, aMx, bits),
      ZOrderLayout.quantize(col(colB), bMn, bMx, bits), bits)
    df.withColumn(hCol,
      when(col(colA).isNotNull && col(colB).isNotNull, h)
        .otherwise(lit(null).cast("long")))
  }

  /** [[ZOrderLayout.pruningStats]] on the Hilbert index — run both on
    * the same box to read the locality gap directly. */
  def pruningStats(df: DataFrame, colA: String, colB: String,
      bits: Int, nFiles: Int,
      aLo: Double, aHi: Double, bLo: Double, bHi: Double): DataFrame = {
    require(nFiles >= 1 && nFiles <= (1L << (2 * bits)),
      "need 1 <= nFiles <= 4^bits")
    val hSpace = 1L << (2 * bits)
    assign(df, colA, colB, bits)
      .filter(col("h").isNotNull)
      .withColumn("file_id",
        expr(s"(h * ${nFiles.toLong}) div $hSpace"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(colA).cast("double")).as("min_a"),
        max(col(colA).cast("double")).as("max_a"),
        min(col(colB).cast("double")).as("min_b"),
        max(col(colB).cast("double")).as("max_b"))
      .withColumn("scanned",
        col("min_a") <= aHi && col("max_a") >= aLo &&
          col("min_b") <= bHi && col("max_b") >= bLo)
  }
}
