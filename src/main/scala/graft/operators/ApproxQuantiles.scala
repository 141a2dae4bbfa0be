package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate per-group quantiles — the at-scale path next to the
  * exact window-rank quantiles (q35): `percentile_approx` keeps a
  * bounded Greenwald–Khanna summary per group (mergeable, map-side
  * combinable) where the exact form must co-locate and sort every group
  * value. At 100 TB the exact sort is a per-group straggler; the sketch
  * is a constant-size aggregate buffer.
  *
  * The GK guarantee is on RANK, not value: the returned element's rank
  * is within eps·N (eps = 1/accuracy) of the target q·N. Sketch VALUES
  * are therefore not oracle-able (two correct engines may return
  * different in-tolerance elements, and summary-merge order is not
  * canonical) — so the operator emits the GUARANTEE, verified: it
  * re-derives each returned value's exact rank range with one linear
  * aggregate and checks it against the target. The (group, q, pass)
  * output is stable and oracle-gated (constant-true), the same
  * discipline as the q40 audit: a broken sketch fails the gate as a
  * hash mismatch, while in-tolerance wiggle cannot flap it.
  */
object ApproxQuantiles {

  /** Per (group, q): does the approx quantile's exact rank sit within
    * `maxRankErr`·N of q·N? `maxRankErr` should be set far above the
    * sketch's eps (1/accuracy) so data growth never flaps the gate
    * while a real regression (wrong merge, off-by-N rank) trips it. */
  def rankErrorAudit(df: DataFrame, groupCol: String, value: Column,
      qs: Seq[Double], accuracy: Int = 10000,
      maxRankErr: Double = 0.02): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), "qs in (0,1)")
    val approx = df
      .groupBy(col(groupCol))
      .agg(percentile_approx(value.as("v__"),
        array(qs.map(lit): _*), lit(accuracy)).as("ap__"))
      .select(col(groupCol), posexplode(col("ap__")).as(Seq("qi__", "va__")))
      .withColumn("q", element_at(array(qs.map(lit): _*), col("qi__") + 1))
    // exact rank range of each returned value: one broadcast of the
    // tiny (group × q) approx table against the corpus, one aggregate
    val ranks = df.select(col(groupCol), value.as("v__"))
      .join(broadcast(approx), Seq(groupCol))
      .groupBy(col(groupCol), col("q"), col("va__"))
      .agg(count(col("v__")).as("n__"),
        sum(when(col("v__") < col("va__"), 1L).otherwise(0L)).as("below__"),
        sum(when(col("v__") <= col("va__"), 1L).otherwise(0L)).as("atmost__"))
    val target = col("q") * col("n__").cast("double")
    val slack = lit(maxRankErr) * col("n__").cast("double")
    ranks.select(col(groupCol), col("q"),
      (col("atmost__").cast("double") >= target - slack &&
        (col("below__") + 1).cast("double") <= target + slack).as("pass"))
  }
}
