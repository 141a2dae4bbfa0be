package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile normalization — map every group's value distribution onto
  * the POOLED distribution (each row's value replaced by the pooled
  * value at its within-group quantile): the batch-effect correction
  * used when per-source score scales drift (the reference's
  * fundamental pipeline re-ranks per sector for the same reason —
  * `sectorscore.py`; this is the distribution-level version).
  *
  * All rank math is exact integer: within-group rank r of n maps to
  * pooled rank m = 1 + round((r−1)·(N−1)/(n−1)) (endpoints map to
  * endpoints), and the normalized value is the pooled value AT that
  * rank — deterministic under ties because the value at a rank is a
  * multiset property, independent of tie order.
  *
  * Shape at scale: within-group ranks via
  * [[ScalableRank.groupRowNumber]] (range-partitioned, no per-group
  * single task); the pooled rank via [[BudgetSelect.runningTotal]]'s
  * distributed prefix count; one shuffle join on the mapped rank. */
object QuantileNormalize {

  /** (idCols..., groupCol, units, norm_units). `valueUnits` must be
    * integral; NULL units are excluded. */
  def quantileNormalize(df: DataFrame, groupCol: String,
      valueUnits: Column, idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "need tie-breaking id columns")
    val base = df
      .select(Seq(col(groupCol)) ++ idCols.map(col) :+
        valueUnits.cast("long").as("units"): _*)
      .filter(col("units").isNotNull)
    val ranked = ScalableRank.groupRowNumber(base, Seq(groupCol),
      col("units").asc +: idCols.map(col(_).asc), rnCol = "r__",
      nCol = "n__")
    val (pooled, nTotal) = BudgetSelect.runningTotal(
      base.select(col("units").as("pv__")), lit(1L),
      Seq(col("pv__").asc), "pr__")
    // m = 1 + round((r-1)(N-1)/(n-1)); a single-value group (n = 1)
    // maps to the pooled midpoint by the same identity with r-1 = 0
    // replaced by the half-line: m = 1 + round((N-1)/2)
    val dec = "decimal(38,0)"
    def roundDiv(num: Column, den: Column): Column =
      call_function("div", num.cast(dec) * 2 + den.cast(dec),
        den.cast(dec) * 2).cast("long")
    val m = when(col("n__") > 1L,
      lit(1L) + roundDiv(
        (col("r__") - 1L).cast(dec) * lit(math.max(nTotal - 1L, 0L)),
        col("n__") - 1L))
      .otherwise(lit(1L) + roundDiv(lit(math.max(nTotal - 1L, 0L)),
        lit(2L)))
    ranked.withColumn("m__", m)
      .join(pooled, col("m__") === col("pr__"))
      .select(idCols.map(col) ++ Seq(col(groupCol),
        col("units"), col("pv__").as("norm_units")): _*)
  }
}
