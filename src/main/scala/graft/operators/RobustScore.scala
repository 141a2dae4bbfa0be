package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) z-score per group — the outlier-resistant twin
  * of the mean/std hierarchical z-score (q07): a single wild value
  * shifts a mean and inflates a std arbitrarily, but moves a median and
  * MAD not at all, which is why curation pipelines score noisy quality
  * metrics this way.
  *
  *   robust_z = (x − median) / (1.4826 · MAD),
  *   MAD = median(|x − median|)
  *
  * (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD consistent with σ under normality,
  * the standard convention.)
  *
  * Exactness discipline: both medians are type-7 over INTEGER units and
  * every intermediate stays integral via doubling — the median of
  * integers is a half-integer, so 2·median (= floor-pick + ceil-pick)
  * is an integer; deviations |2u − med2| are integers in double units;
  * their median doubles once more (mad4 = 4 × MAD in units). One double
  * formula at the end:
  *
  *   z = (2u − med2) · 2 / (1.4826 · mad4)
  *
  * — exactly-determined integer operands, one multiply/divide chain,
  * mirrored verbatim in the oracle. A zero MAD (more than half the
  * group identical) yields NULL z, not ±inf. Two in-group window sorts
  * (ranks over u, then over the deviations); `ScalableRank` is the
  * skew-proof rank path when a group outgrows one task. */
object RobustScore {

  private def pickP50(units: Column, rn: Column, n: Column): Column = {
    val pos = lit(0.5) * (n - 1).cast("double")
    max(when(rn === (floor(pos) + 1), units)) +
      max(when(rn === (ceil(pos) + 1), units))
  }

  /** df + (med2, mad4, robust_z) where `valueUnits` is an integer-unit
    * metric expression (units per 1.0 cancel algebraically in z, so no
    * scale parameter). Groups whose metric is entirely NULL pass
    * through with NULL med2/mad4/robust_z — the left joins below keep
    * every input row.
    *
    * `scalable = true` replaces both per-group window sorts (one task
    * per group) with [[ScalableRank.groupRowNumber]] range-partitioned
    * sorts — identical (rn, n)/(drn) semantics, value-equal output
    * (RobustScoreSpec asserts it); default stays the window form. */
  def madZScore(df: DataFrame, groupCols: Seq[String], valueUnits: Column,
      roundTo: Int = 4, scalable: Boolean = false): DataFrame = {
    val gcols = groupCols.map(col)
    val wSort = Window.partitionBy(gcols: _*).orderBy(col("u__"))
    val wAll = Window.partitionBy(gcols: _*)
    val units = df
      .select(gcols :+ valueUnits.cast("long").as("u__"): _*)
      .filter(col("u__").isNotNull)
    // PERSISTED (r21, guide §5): the ranked frame is a diamond — the
    // median aggregate, the deviation chain, and (through med's and
    // mad's lineage in the final attaches) two more consumers all
    // re-derived the rank ladder without it; q149's gap ladder ran 4x
    val ranked = graft.Caches.register((
      if (scalable) ScalableRank.groupRowNumber(units, groupCols,
        Seq(col("u__").asc), rnCol = "rn", nCol = "n")
      else units
        .withColumn("rn", row_number().over(wSort).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // NULL-SAFE stats joins throughout (StatsJoin.attach): a NULL group
    // KEY is a real group (window partitionBy treats it as one) whose
    // median a plain using-join would never match — its rows would lose
    // med2/mad4 despite both being defined.
    val med = ranked.groupBy(gcols: _*)
      .agg(pickP50(col("u__"), col("rn"), col("n")).as("med2"))
    val wDev = Window.partitionBy(gcols: _*).orderBy(col("dev2__"))
    val deviations = StatsJoin.attach(ranked, med, groupCols, "inner")
      .withColumn("dev2__", abs(col("u__") * 2 - col("med2")))
    val devRanked =
      if (scalable) ScalableRank.groupRowNumber(deviations, groupCols,
        Seq(col("dev2__").asc), rnCol = "drn", nCol = "graft_n2__")
        .drop("graft_n2__")
      else deviations
        .withColumn("drn", row_number().over(wDev).cast("long"))
    val mad = devRanked.groupBy(gcols: _*)
      .agg(pickP50(col("dev2__"), col("drn"), col("n")).as("mad4"))
    StatsJoin.attach(StatsJoin.attach(df, med, groupCols, "left"),
        mad, groupCols, "left")
      .withColumn("robust_z",
        when(col("mad4") > 0 && valueUnits.isNotNull,
          round((valueUnits.cast("long") * 2 - col("med2")).cast("double")
            * 2.0 / (lit(1.4826) * col("mad4").cast("double")), roundTo)))
  }
}
