package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W2 — hierarchical group-wise z-score + weighted composite
  * (SURVEY.md §2.5 W2; ref calcompositescore.py:202-302).
  *
  * Semantics preserved from the reference:
  *  - per row, the normalization group is the INNER partition (e.g.
  *    cap×sector×industry) when that group has >= `minInnerSize` members,
  *    otherwise the OUTER partition (cap×sector) down-weighted by
  *    `fallbackWeight` (ref :272-299, weight 0.8);
  *  - a metric contributes only when it has >= `minPeers` non-null values
  *    in the chosen group AND non-zero std (ref :250-256); otherwise, and
  *    for NULL values, it contributes 0.0;
  *  - std is SAMPLE std (pandas ddof=1 ⇒ stddev_samp, SURVEY §7 risk 5);
  *  - rows with null group keys fall outward / contribute 0 (the
  *    reference's NaN-category skips, :273-291).
  *
  * Scale: the required statistics are pure per-group aggregates (no
  * ordering), so they are computed with groupBy (map-side partial
  * aggregation) and joined back. Group cardinality (categories × sectors
  * × industries) is tiny relative to rows, so both stat tables
  * auto-broadcast and the whole operator is ONE scan + two broadcast
  * joins — no window sort, and a skewed giant group costs nothing extra
  * (the window formulation sorts the skewed partition in one task; this
  * one never sorts). Measured 22 s → ~8 s at 10M rows with a 40%-skewed
  * group.
  */
object HierarchicalZScore {

  /** Weighted composite score over several metrics (A6, ref :161-198).
    * `metrics` maps column name -> weight. Adds `outCol` rounded to 2dp
    * (reference rounding discipline F7, ref :198).
    */
  def apply(
      df: DataFrame,
      metrics: Seq[(String, Double)],
      inner: Seq[String],
      outer: Seq[String],
      outCol: String = "composite_score",
      minInnerSize: Int = 2,
      minPeers: Int = 3,
      fallbackWeight: Double = 0.8): DataFrame = {

    // Engine-exact, order-independent statistics: the inputs are 2dp
    // money / integer counts, so Σx and Σx² are EXACT when accumulated
    // as decimals — summation order (task scheduling, partial aggs)
    // cannot change them, unlike raw-double avg/stddev whose partial
    // sums reassociate nondeterministically. mu and sd are then derived
    // in double with one fixed formula mirrored verbatim by the oracle
    // SQL, so both engines compute bit-identical values.
    // Widths: keep Spark's NATURAL widened sum types — sum(decimal(18,2))
    // = decimal(28,2), sum(decimal(37,4)) = decimal(38,4). Down-casting
    // them (as an earlier revision did, to decimal(18,4)) caps Σx² at
    // ~1e14 and overflows under ANSI at realistic money magnitudes
    // (Σx² ≈ 2e16 observed at 15k customers). All derived products below
    // stay within 38 digits with scale preserved, so the arithmetic
    // remains EXACT end to end.
    def statAggs(level: String) =
      count(lit(1)).as(s"size_$level") +: metrics.flatMap { case (m, _) =>
        val xd = col(m).cast("decimal(18,2)")
        Seq(count(col(m)).as(s"cnt_${m}_$level"),
          sum(xd).as(s"sx_${m}_$level"),
          sum(xd * xd).as(s"sxx_${m}_$level"))
      }

    // stats per level via groupBy: null group keys form their own group
    // but the join below never matches them (non-null-safe equality), so
    // null-keyed rows see null stats and the guards zero them out.
    val iAggs = statAggs("i")
    val oAggs = statAggs("o")
    val innerStats = df.groupBy(inner.map(col): _*).agg(iAggs.head, iAggs.tail: _*)
    val outerStats = df.groupBy(outer.map(col): _*).agg(oAggs.head, oAggs.tail: _*)

    val joined = df
      .join(innerStats, inner, "left")
      .join(outerStats, outer, "left")

    // varnum = n·Σx² − (Σx)² is an EXACT decimal (Cauchy-Schwarz ⇒ ≥ 0,
    // and = 0 iff the group is constant, so the std≠0 guard is exact
    // too — no epsilon). mu/sd come out of it in double arithmetic with
    // operand order fixed by this one expression tree.
    def z(m: String, level: String): Column = {
      val v = col(m)
      val cnt = col(s"cnt_${m}_$level")
      val sx = col(s"sx_${m}_$level")
      val sxx = col(s"sxx_${m}_$level")
      // decimal(20,0)·decimal(38,4) and decimal(28,2)² both resolve to
      // decimal(38,4) with scale 4 PRESERVED (Spark reduces scale only
      // when integer digits exceed 38), so varnum is exact.
      val varnum = cnt.cast("decimal(20,0)") * sxx - sx * sx
      val cntD = cnt.cast("double")
      val mu = sx.cast("double") / cntD
      val sd = sqrt(varnum.cast("double") / (cntD * (cntD - lit(1.0))))
      when(v.isNotNull && cnt >= minPeers && varnum > 0,
        (v - mu) / sd).otherwise(lit(0.0))
    }

    val innerKeysOk = inner.map(col(_).isNotNull).reduce(_ && _)
    val outerKeysOk = outer.map(col(_).isNotNull).reduce(_ && _)
    val total = metrics.map { case (m, w) =>
      when(innerKeysOk && col("size_i") >= minInnerSize, z(m, "i") * w)
        .when(outerKeysOk, z(m, "o") * w * fallbackWeight)
        .otherwise(lit(0.0))
    }.reduce(_ + _)

    joined
      .withColumn(outCol, round(total, 2))
      .drop("size_i" +: "size_o" +:
        metrics.flatMap { case (m, _) =>
          Seq("i", "o").flatMap(l =>
            Seq(s"cnt_${m}_$l", s"sx_${m}_$l", s"sxx_${m}_$l"))
        }: _*)
  }

  /** Per-metric weighted z contribution as a window expression — the
    * single-pass Column form, kept for composition inside other window
    * pipelines. The DataFrame `apply` above is the scale path. */
  def contribution(
      metric: Column,
      weight: Double,
      inner: Seq[Column],
      outer: Seq[Column],
      minInnerSize: Int = 2,
      minPeers: Int = 3,
      fallbackWeight: Double = 0.8): Column = {
    val wI = Window.partitionBy(inner: _*)
    val wO = Window.partitionBy(outer: _*)
    // Same decimal Σx/Σx² formulation as `apply` (order-independent,
    // overflow-safe at natural sum widths) so both forms are engine-exact
    // and mutually consistent.
    def z(w: org.apache.spark.sql.expressions.WindowSpec): Column = {
      val xd = metric.cast("decimal(18,2)")
      val cnt = count(metric).over(w)
      val sx = sum(xd).over(w)
      val sxx = sum(xd * xd).over(w)
      val varnum = cnt.cast("decimal(20,0)") * sxx - sx * sx
      val cntD = cnt.cast("double")
      val mu = sx.cast("double") / cntD
      val sd = sqrt(varnum.cast("double") / (cntD * (cntD - lit(1.0))))
      when(metric.isNotNull && cnt >= minPeers && varnum > 0,
        (metric - mu) / sd).otherwise(lit(0.0))
    }
    val innerSize = count(lit(1)).over(wI)
    val innerKeysOk = inner.map(_.isNotNull).reduce(_ && _)
    val outerKeysOk = outer.map(_.isNotNull).reduce(_ && _)
    when(innerKeysOk && innerSize >= minInnerSize, z(wI) * weight)
      .when(outerKeysOk, z(wO) * weight * fallbackWeight)
      .otherwise(lit(0.0))
  }
}
