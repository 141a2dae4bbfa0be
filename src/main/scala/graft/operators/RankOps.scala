package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 / W4 / W5 / T2 — ranking, banding, min-max normalization, top-k
  * (SURVEY.md §2.5-2.6).
  */
object RankOps {

  /** W1 — market-cap-style banding by global rank
    * (ref calcompositescore.py:207-218): sort by value desc nulls last,
    * first `bands` thresholds get labels, NULL value -> NULL band.
    * `tieBreak` makes the rank deterministic (the reference relies on
    * pandas' stable index order; we pin an explicit key).
    *
    * Scale: `row_number` over an un-partitioned window is a
    * single-partition exchange — exact but a ceiling at 100 TB. For
    * cluster scale use `bandByRankScalable`, which gets the identical
    * result from a RangePartitioner-backed global sort without funnelling
    * rows through one task.
    */
  def bandByRank(
      df: DataFrame,
      value: Column,
      tieBreak: Column,
      bands: Seq[(Long, String)], // ascending thresholds -> label
      lastLabel: String,
      outCol: String = "band"): DataFrame = {
    val w = Window.orderBy(value.desc_nulls_last, tieBreak.asc)
    val rn = row_number().over(w)
    val banded = bands.foldRight(lit(lastLabel)) { case ((thresh, label), acc) =>
      when(rn <= thresh, lit(label)).otherwise(acc)
    }
    df.withColumn(outCol, when(value.isNull, lit(null).cast("string")).otherwise(banded))
  }

  /** W1 at cluster scale: global rank via sortWithinPartitions over a
    * range partitioning + per-partition offsets (zipWithIndex-style),
    * avoiding the single-partition window exchange. Identical output to
    * `bandByRank`.
    */
  def bandByRankScalable(
      df: DataFrame,
      valueCol: String,
      tieBreakCol: String,
      bands: Seq[(Long, String)],
      lastLabel: String,
      outCol: String = "band"): DataFrame = {
    // Global rank via ScalableRank.withGlobalPosition: range partition +
    // in-partition sort, per-partition counts as one codegen'd aggregate,
    // positions from a broadcast offset join — the whole pass stays in
    // Tungsten (no RDD conversion, no Row materialization). One persist
    // of the sorted data serves both the count and rank passes.
    val out = ScalableRank.withGlobalPosition(df,
      Seq(col(valueCol).desc_nulls_last, col(tieBreakCol).asc), 0, "graft_rn")
    val banded = bands.foldRight(lit(lastLabel)) { case ((thresh, label), acc) =>
      when(col("graft_rn") <= thresh, lit(label)).otherwise(acc)
    }
    out.withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("string")).otherwise(banded))
      .drop("graft_rn")
  }

  /** W4 — rank within group (ref calfundamentalscore.py:339-346). */
  def rankInGroup(value: Column, tieBreak: Column, group: Column*): Column =
    row_number().over(
      Window.partitionBy(group: _*).orderBy(value.desc_nulls_last, tieBreak.asc))

  /** W5 — min-max normalize within group; constant group -> 1.0
    * (ref sectorscore.py:72-78). Group-partitioned window only. */
  def minMaxNorm(value: Column, group: Column*): Column = {
    val w = Window.partitionBy(group: _*)
    val mn = min(value).over(w)
    val mx = max(value).over(w)
    when(value.isNull, lit(null).cast("double"))
      .when(mx === mn, lit(1.0))
      .otherwise((value - mn) / (mx - mn))
  }

  /** T2/T3 — deterministic top-k (ref nlargest, calcompositescore.py:397).
    * Compiles to TakeOrderedAndProject: per-partition heap + driver merge,
    * no global sort. */
  def topK(df: DataFrame, k: Int, value: Column, tieBreak: Column,
      ascending: Boolean = false): DataFrame =
    topKMulti(df, k, value, Seq(tieBreak), ascending)

  /** Per-GROUP deterministic top-k — the "3 best per segment" staple.
    * Declared as the plain rank-filter idiom (row_number window +
    * `<= k` filter) ON PURPOSE: Catalyst's InferWindowGroupLimit
    * rewrites exactly this shape into a WindowGroupLimit that keeps a
    * size-k heap per group on the MAP side before the shuffle — at
    * 100 TB the exchange moves ~k rows per (group × input partition),
    * not the table. PlanAuditSpec pins the rewrite so a refactor
    * can't silently fall back to the full window sort. Ordering is
    * total per group ((value dir, tieBreaks asc) — callers pass a
    * unique tie-break) so results are engine-exact. */
  def groupTopK(df: DataFrame, groups: Seq[String], k: Int,
      value: Column, tieBreaks: Seq[Column],
      ascending: Boolean = false, rankCol: String = "rnk"): DataFrame = {
    require(k >= 1 && groups.nonEmpty, "need k >= 1 and group columns")
    val ord = if (ascending) value.asc_nulls_last else value.desc_nulls_last
    val w = Window.partitionBy(groups.map(col): _*)
      .orderBy(ord +: tieBreaks.map(_.asc): _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** [[topK]] with a COMPOSITE tie-break — for callers whose natural
    * uniqueness key is a tuple (e.g. a bigram (w1, w2)). A concatenated
    * single-column tie-break is NOT equivalent: tuple order and
    * joined-string order diverge when values contain characters below
    * the join separator ('a' < 'ab' as a tuple, but with a space
    * separator 'a ...' > 'ab ...' concatenated — r11 advice), so
    * engines must tie-break on the same STRUCTURAL key. */
  def topKMulti(df: DataFrame, k: Int, value: Column,
      tieBreaks: Seq[Column], ascending: Boolean = false): DataFrame = {
    val ord = if (ascending) value.asc_nulls_last else value.desc_nulls_last
    df.orderBy(ord +: tieBreaks.map(_.asc): _*).limit(k)
  }
}
