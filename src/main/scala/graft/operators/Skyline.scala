package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front) — the rows not dominated on two
  * maximize-criteria (row r dominates s iff r >= s on both and > on
  * at least one): the classic "best tradeoffs" database operator
  * (Börzsönyi et al., ICDE 2001), here the data-curation question
  * "which documents are on the quality-vs-length frontier?".
  *
  * The O(n log n) sort-scan formulation, distributed: reduce to one
  * candidate per distinct x (only the max-y row of an x-group can
  * survive — anything below it is dominated by it), sweep x
  * DESCENDING with an exclusive prefix max of y
  * ([[BudgetSelect.runningMaxExclusive]] — range-partitioned, no
  * single-task window): a candidate survives iff its y strictly
  * exceeds every y seen at strictly better x. Ties: rows with
  * identical (x, y) do not dominate each other (no strict edge) and
  * all survive — the join-back keeps them.
  *
  * Shape at scale: one groupBy(x), the distributed prefix-max scan
  * over |distinct x| rows, one shuffle join back on (x, y). */
object Skyline {

  /** Rows of `df` on the maximize-maximize Pareto front of integral
    * expressions `xUnits`/`yUnits`: (idCols..., x_units, y_units).
    * NULL on either criterion excludes the row. */
  def paretoFront2D(df: DataFrame, xUnits: Column, yUnits: Column,
      idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "need id columns to report survivors")
    // pts feeds BOTH the candidate aggregate (materialized by the
    // sweep's partition-max collect) and the final semi join — without
    // the persist the caller's upstream lineage (q153: the full
    // quality-signal text pass) recomputes once per consumer (r20,
    // guide §5: cache only reused+expensive subtrees; this is both)
    val pts = graft.Caches.register(df
      .select(idCols.map(col) :+ xUnits.cast("long").as("x_units") :+
        yUnits.cast("long").as("y_units"): _*)
      .filter(col("x_units").isNotNull && col("y_units").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cands = pts.groupBy(col("x_units"))
      .agg(max(col("y_units")).as("my__"))
    val swept = BudgetSelect.runningMaxExclusive(cands, col("my__"),
      Seq(col("x_units").desc), "pm__")
    val sky = swept
      .filter(col("pm__").isNull || col("my__") > col("pm__"))
      .select(col("x_units"), col("my__").as("y_units"))
    pts.join(sky, Seq("x_units", "y_units"), "left_semi")
      .select(idCols.map(col) :+ col("x_units") :+ col("y_units"): _*)
  }
}
