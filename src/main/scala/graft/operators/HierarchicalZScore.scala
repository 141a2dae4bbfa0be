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
  *  - std is SAMPLE std (pandas ddof=1 ⇒ stddev_samp, SURVEY §7 risk 5).
  *
  * Scale: one hash-partitioned shuffle per window family (inner + outer),
  * shared by all metrics — Catalyst computes every per-metric avg/std/count
  * for the same partitioning inside a single Window node. No global
  * exchange; both partitionings are on low-cardinality keys so AQE can
  * coalesce partitions. At 100 TB, group cardinality (categories ×
  * sectors × industries) is small relative to rows, so partitions stay
  * balanced; skewed giant groups are handled by AQE skew-split because
  * nothing here needs ordering within the partition.
  */
object HierarchicalZScore {

  /** Per-metric weighted z contribution. */
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
    def z(w: org.apache.spark.sql.expressions.WindowSpec): Column = {
      val cnt = count(metric).over(w)
      val mu = avg(metric).over(w)
      val sd = stddev_samp(metric).over(w)
      when(metric.isNotNull && cnt >= minPeers && sd.isNotNull && sd =!= 0.0,
        (metric - mu) / sd).otherwise(lit(0.0))
    }
    val innerSize = count(lit(1)).over(wI)
    // Null group keys: the reference's group loops skip NaN categories
    // entirely (calcompositescore.py:273-291) — a row with a null inner
    // key falls to the outer level; null outer keys contribute 0.
    val innerKeysOk = inner.map(_.isNotNull).reduce(_ && _)
    val outerKeysOk = outer.map(_.isNotNull).reduce(_ && _)
    when(innerKeysOk && innerSize >= minInnerSize, z(wI) * weight)
      .when(outerKeysOk, z(wO) * weight * fallbackWeight)
      .otherwise(lit(0.0))
  }

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
    val total = metrics
      .map { case (m, w) =>
        contribution(col(m), w, inner.map(col), outer.map(col),
          minInnerSize, minPeers, fallbackWeight)
      }
      .reduce(_ + _)
    df.withColumn(outCol, round(total, 2))
  }
}
