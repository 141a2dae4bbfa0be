package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group winsorization: clip a metric to its group's exact
  * [pLow, pHigh] type-7 quantile band — the outlier-capping step of a
  * feature pipeline (robust twin of the fixed caps in `Cleanse.capAt`;
  * completes the scaling family next to min-max q10, z-score q07,
  * rank q09).
  *
  * Quantile bounds reuse the q35 window-rank discipline: integer-scaled
  * values (engine-exact lerp), one in-group sort for (rank, count), a
  * boundary-row pick aggregate, and the type-7 formula
  * `lo + (hi−lo)·frac` — never a black-box percentile builtin (whose
  * float op order differs between engines; see README). Bounds are a
  * tiny per-group table joined back broadcast, and the clip itself is a
  * codegen'd `least(greatest(...))` projection.
  *
  * The in-group window sort is the documented cost center at corpus
  * scale (one task per group); `ScalableRank` is the skew-proof rank
  * path and `ApproxQuantiles` (GK) the sketch path when groups are
  * huge — this operator is the exact-semantics form. NULL values pass
  * through unclipped (no quantile is defined for them; a row without a
  * metric should stay visibly null, not become a bound). */
object Winsorize {

  /** Returns `df` plus (loCol, hiCol, clippedCol), where the value
    * column is an integer-scaled metric expression (`scale` units per
    * 1.0, e.g. 100 for cents) — integer ranks make the lerp bit-equal
    * across engines.
    *
    * `scalable = true` swaps the per-group window sort (one task per
    * group — a straggler when a group outgrows one task's memory) for
    * [[ScalableRank.groupRowNumber]]'s range-partitioned global sort:
    * identical (rn, n) semantics, so bounds and clips are value-equal
    * (WinsorizeSpec asserts it); the window form stays the default for
    * its lower fixed cost at moderate group sizes. */
  def clipToQuantiles(df: DataFrame, groupCols: Seq[String],
      valueUnits: org.apache.spark.sql.Column, scale: Long,
      pLow: Double, pHigh: Double,
      outPrefix: String = "wins", scalable: Boolean = false): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      "need 0 <= pLow < pHigh <= 1")
    val gcols = groupCols.map(col)
    val wSort = Window.partitionBy(gcols: _*).orderBy(col("units__"))
    val wAll = Window.partitionBy(gcols: _*)
    val units = df
      .select(gcols :+ valueUnits.as("units__"): _*)
      .filter(col("units__").isNotNull)
    val ranked =
      if (scalable) ScalableRank.groupRowNumber(units, groupCols,
        Seq(col("units__").asc), rnCol = "rn", nCol = "n")
      else units
        .withColumn("rn", row_number().over(wSort).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
    val qs = Seq("lo" -> pLow, "hi" -> pHigh)
    val aggs = qs.flatMap { case (nm, q) =>
      val pos = lit(q) * (col("n") - 1).cast("double")
      Seq(
        max(when(col("rn") === (floor(pos) + 1), col("units__"))).as(s"${nm}_a"),
        max(when(col("rn") === (ceil(pos) + 1), col("units__"))).as(s"${nm}_b"),
        max(pos - floor(pos)).as(s"${nm}_f"))
    }
    val bounds = ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    def lerp(nm: String) =
      (col(s"${nm}_a") +
        (col(s"${nm}_b") - col(s"${nm}_a")).cast("double") * col(s"${nm}_f")) /
        scale.toDouble
    val boundCols = bounds.select(
      gcols :+ lerp("lo").as(s"${outPrefix}_lo") :+
        lerp("hi").as(s"${outPrefix}_hi"): _*)
    // left join, NULL-SAFE on the group keys (StatsJoin.attach): a
    // group whose metric is entirely NULL has no bounds row but its
    // input rows must survive, and a NULL group KEY is a real group
    // (window partitionBy treats it as one) whose bounds a plain
    // using-join would never match — its rows would pass through
    // silently UNCLIPPED (least/greatest skip NULL bounds).
    StatsJoin.attach(df, boundCols, groupCols, "left")
      .withColumn(s"${outPrefix}_value",
        when((valueUnits / scale.toDouble).isNull,
          lit(null).cast("double"))
          .otherwise(least(greatest(valueUnits / scale.toDouble,
            col(s"${outPrefix}_lo")), col(s"${outPrefix}_hi"))))
  }
}
