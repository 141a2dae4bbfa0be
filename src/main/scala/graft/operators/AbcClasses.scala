package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ABC / Pareto-class analysis — per group, rank items by a value
  * descending and classify by CUMULATIVE share: class A carries the
  * first `aPermille`‰ of the group's total, B up to `bPermille`‰, C
  * the tail (the classic 80/95 inventory split; here "which documents
  * carry 80% of a source's tokens"). All boundaries are exact
  * integer cross-multiplications (cum·1000 <= threshold·total), no
  * percent floats anywhere.
  *
  * The classifying row is the one that CROSSES the boundary: a row
  * belongs to A iff its cumulative total (inclusive) is the first to
  * reach into the A band — concretely, class = A when
  * prev_cum·1000 < aPermille·total (the row starts inside the A
  * band), B when it starts inside the B band, else C. Deterministic
  * under the (value desc, id asc) total order.
  *
  * Shape at scale: one per-group window family (cumulative sum +
  * total) — groups are sources/segments; a corpus dominated by one
  * group should rank via [[ScalableRank.groupRowNumber]] first (the
  * [[GroupStats.weightedMedian]] note). */
object AbcClasses {

  def abcClasses(df: DataFrame, groupCol: String, idCol: String,
      valueUnits: Column, aPermille: Int = 800,
      bPermille: Int = 950): DataFrame = {
    require(0 < aPermille && aPermille < bPermille && bPermille <= 1000,
      "need 0 < aPermille < bPermille <= 1000")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(groupCol), col(idCol),
        valueUnits.cast("long").as("units"))
      .filter(col("units").isNotNull)
    val cumW = Window.partitionBy(col(groupCol))
      .orderBy(col("units").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
    val dec = "decimal(38,0)"
    val prev = (col("cum_units") - col("units")).cast(dec) * 1000L
    val tot = col("total_units").cast(dec)
    base
      .withColumn("cum_units", sum(col("units")).over(cumW))
      .withColumn("total_units", sum(col("units")).over(totW))
      .withColumn("abc_class",
        when(prev < tot * aPermille.toLong, "A")
          .when(prev < tot * bPermille.toLong, "B")
          .otherwise("C"))
  }
}
