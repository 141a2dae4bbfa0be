package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A6 / A7 — weighted sums and null-renormalized weighted averages
  * (SURVEY.md §2.4; ref calcompositescore.py:161-198,
  * calfundamentalscore.py:206-228, sectorscore.py:49-82).
  * Pure `select`-expression arithmetic: no shuffle, fully codegen'd.
  */
object WeightedScore {

  /** A6 — Σ wᵢ·coalesce(mᵢ, 0) (missing metric contributes 0). */
  def weightedSum(metrics: Seq[(Column, Double)]): Column =
    metrics.map { case (m, w) => coalesce(m, lit(0.0)) * w }.reduce(_ + _)

  /** A7 — weighted average over the NON-NULL metrics only, re-normalizing
    * the weights (ref calfundamentalscore.py:206-228):
    * Σ(wᵢ·mᵢ | mᵢ not null) / Σ(wᵢ | mᵢ not null); NULL when all missing.
    */
  def renormalizedWeightedAvg(metrics: Seq[(Column, Double)]): Column = {
    val num = metrics.map { case (m, w) =>
      when(m.isNotNull, m * w).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = metrics.map { case (m, w) =>
      when(m.isNotNull, lit(w)).otherwise(lit(0.0))
    }.reduce(_ + _)
    when(den === 0.0, lit(null).cast("double")).otherwise(num / den)
  }
}
