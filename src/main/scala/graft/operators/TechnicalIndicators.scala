package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.ExactRound

/** Technical-indicator cards over grouped DAILY series — the
  * reference domain's (TradingView pipelines) indicator family beyond
  * the MACD histogram already in [[graft.functions.Cleanse]] (F5):
  * max drawdown, simple-average RSI, Bollinger-band breakout counts,
  * and daily VWAP, each in the exact-integer discipline (values enter
  * as caller-scaled integer units; every ratio is an e-scaled
  * half-up rational; the σ-band test compares SQUARES so no square
  * root ever enters the lineage).
  *
  * Shape at scale: one daily-aggregate shuffle feeds per-group
  * windows whose cardinality is days×groups — bounded by the
  * calendar, not data volume; everything else is map-side-combinable
  * aggregation. */
object TechnicalIndicators {

  private def daily(df: DataFrame, groupCols: Seq[String],
      dayUnits: Column, valueUnits: Column): DataFrame =
    df.select(groupCols.map(col) :+ dayUnits.cast("long").as("day")
        :+ valueUnits.cast("long").as("vu__"): _*)
      .groupBy(groupCols.map(col) :+ col("day"): _*)
      .agg(sum(col("vu__")).cast("long").as("v__"))

  /** MAX DRAWDOWN per group — largest peak-to-trough drop of the
    * daily series: running peak (prefix max), drawdown = peak − value,
    * argmax on (drawdown DESC, day ASC). Emits the peak and trough
    * values alongside, in the caller's units. */
  def maxDrawdown(df: DataFrame, groupCols: Seq[String],
      dayUnits: Column, valueUnits: Column): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily(df, groupCols, dayUnits, valueUnits)
      .withColumn("peak__", max(col("v__")).over(w))
      .withColumn("dd__", col("peak__") - col("v__"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_days"),
        max(struct(col("dd__"), (-col("day")).as("nd__"),
          col("peak__").as("pk__"), col("v__").as("tr__"))).as("b__"))
      .select(g ++ Seq(col("n_days"),
        col("b__.dd__").as("max_drawdown"),
        (-col("b__.nd__")).as("at_day"),
        col("b__.pk__").as("peak"), col("b__.tr__").as("trough")): _*)
  }

  /** Simple-average RSI per (group, day) — over the last `window`
    * OBSERVED day-over-day deltas, gains / (gains + losses) as the
    * exact e6 (= RSI/100; Wilder's recursive smoothing is an EWMA and
    * deliberately NOT used — its infinite memory has no exact
    * windowed form). Flat windows read 0 by the zero-denominator
    * convention; each group's first day has no delta and emits no
    * row. */
  def rsiSimple(df: DataFrame, groupCols: Seq[String],
      dayUnits: Column, valueUnits: Column,
      window: Int = 14): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val g = groupCols.map(col)
    val wl = Window.partitionBy(g: _*).orderBy(col("day"))
    val wr = Window.partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily(df, groupCols, dayUnits, valueUnits)
      .withColumn("dl__", col("v__") - lag(col("v__"), 1).over(wl))
      .filter(col("dl__").isNotNull)
      .withColumn("g__",
        sum(when(col("dl__") > 0, col("dl__")).otherwise(0L)).over(wr)
          .cast("long"))
      .withColumn("l__",
        sum(when(col("dl__") < 0, -col("dl__")).otherwise(0L)).over(wr)
          .cast("long"))
      .withColumn("wr__", count(lit(1)).over(wr).cast("long"))
      .select(g ++ Seq(col("day"), col("dl__").as("delta"),
        col("wr__").as("win_rows"),
        ExactRound.ratioScaled(col("g__"), col("g__") + col("l__"), 6)
          .as("rsi_e6")): _*)
  }

  /** BOLLINGER breakout counts per group — days whose value leaves
    * the ±2σ band of the trailing `window`-row population stats,
    * tested on SQUARES: |x−μ| > 2σ ⟺ (n·x − Σx)² > 4·(n·Σx² − (Σx)²)
    * — exact DECIMAL(38,0) integers, no root. Counts split by side;
    * windows shorter than 2 rows can't break out (zero variance and
    * zero deviation). */
  def bollingerBreakouts(df: DataFrame, groupCols: Seq[String],
      dayUnits: Column, valueUnits: Column,
      window: Int = 20): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val g = groupCols.map(col)
    val wr = Window.partitionBy(g: _*).orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    def dec(c: Column) = c.cast("decimal(38,0)")
    daily(df, groupCols, dayUnits, valueUnits)
      .withColumn("n__", count(lit(1)).over(wr).cast("long"))
      .withColumn("sx__", sum(col("v__")).over(wr).cast("long"))
      .withColumn("sxx__", sum(dec(col("v__")) * col("v__")).over(wr))
      .withColumn("dev__", dec(col("n__")) * col("v__") - col("sx__"))
      .withColumn("brk__",
        col("dev__") * col("dev__") >
          lit(4L) * (dec(col("n__")) * col("sxx__") -
            dec(col("sx__")) * col("sx__")))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("brk__") && col("dev__") > 0, 1L).otherwise(0L))
          .cast("long").as("n_above"),
        sum(when(col("brk__") && col("dev__") < 0, 1L).otherwise(0L))
          .cast("long").as("n_below"))
  }

  /** Daily VWAP — Σ(price·qty units) / Σ(qty units) per day as the
    * exact e4 rational (the caller passes extended = price·qty
    * already multiplied, the lineitem convention). One map-side
    * combinable aggregate, no windows. */
  def vwapDaily(df: DataFrame, dayUnits: Column,
      extendedUnits: Column, qtyUnits: Column): DataFrame =
    df.select(dayUnits.cast("long").as("day"),
        extendedUnits.cast("long").as("pq__"),
        qtyUnits.cast("long").as("q__"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("pq__")).cast("long").as("sum_extended"),
        sum(col("q__")).cast("long").as("sum_qty"))
      .select(col("day"), col("n_lines"), col("sum_extended"),
        col("sum_qty"),
        ExactRound.ratioScaled(col("sum_extended"), col("sum_qty"), 4)
          .as("vwap_e4"))
}
