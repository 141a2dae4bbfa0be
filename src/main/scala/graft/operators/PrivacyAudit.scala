package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit — the privacy QA pass a dataset
  * release runs alongside PII scrubbing ([[PiiScrub]] removes direct
  * identifiers; THIS measures whether quasi-identifier combinations
  * still single people out). Per equivalence class (one distinct
  * combination of the quasi-identifier columns): its size, the number
  * of distinct sensitive values it contains, and the two standard
  * flags — `k_anonymous` (size >= k: an attacker matching the
  * quasi-identifiers finds at least k candidates) and `l_diverse`
  * (>= l distinct sensitive values: matching does not reveal the
  * sensitive attribute even within the class).
  *
  * Shape at scale: one groupBy over the quasi-identifier tuple with
  * (count, count_distinct) — the distinct turns into Spark's standard
  * two-phase Expand/partial-agg plan, map-side combinable; no windows,
  * no driver state. NULL quasi values form their own class (a null
  * zip code is itself a linkable signal). */
object PrivacyAudit {

  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("class_size"),
        col("n_sensitive"),
        (col("class_size") >= k).as("k_anonymous"),
        (col("n_sensitive") >= l).as("l_diverse")): _*)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung after [[kAnonymity]]'s k/l flags: even an l-diverse
    * class leaks when its sensitive-value DISTRIBUTION diverges from
    * the table's ("this zip code skews rich"). Per equivalence class,
    * the Earth Mover's Distance between the class's distribution of an
    * ORDERED sensitive attribute (pre-bucketed to integer units by the
    * caller) and the global distribution, under the standard
    * equal-spacing ground distance: with the m distinct global values
    * in order, EMD = (1/(m-1)) · Σ_i |Σ_{j<=i} (p_j − q_j)| — the
    * normalized sum of absolute cumulative-probability gaps.
    *
    * Exact integer lineage: each gap is |cumC·N − cumG·n_c| / (n_c·N),
    * so the per-class sum is one DECIMAL(38,0) accumulator and the
    * single final division ships as the half-up `emd_e6` long (0 when
    * m = 1, the zero-denominator convention — one global value means
    * nothing to leak).
    *
    * Shape at scale: the class×value grid is |classes|·m rows (m is
    * bounded by the caller's bucketing, so the cross join broadcasts
    * m rows), one per-class cumulative window over that grid, and a
    * 1-row broadcast of the corpus totals. The global cumulative runs
    * over the m-row value table only — a bounded single-partition
    * window, not a data-sized one. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveUnits: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.ExactRound
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val q = quasiCols.map(col)
    val cv = df
      .select(q :+ sensitiveUnits.cast("long").as("v__"): _*)
      .groupBy(q :+ col("v__"): _*)
      .agg(count(lit(1)).as("c__"))
    val cls = cv.groupBy(q: _*)
      .agg(sum(col("c__")).cast("long").as("class_size"))
    val gv = cv.groupBy(col("v__"))
      .agg(sum(col("c__")).cast("long").as("g__"))
    val wg = Window.orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = gv.select(col("v__"),
      sum(col("g__")).over(wg).cast("long").as("cumg__"))
    val tot = gv.agg(sum(col("g__")).cast("long").as("n__"),
      count(lit(1)).cast("long").as("m__"))
    val wc = Window.partitionBy(q: _*).orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cls
      .crossJoin(broadcast(gcum))
      .join(cv, quasiCols :+ "v__", "left")
      .withColumn("cc__", coalesce(col("c__"), lit(0L)))
      .withColumn("cumc__", sum(col("cc__")).over(wc).cast("long"))
      .crossJoin(broadcast(tot))
      .groupBy(q :+ col("class_size") :+ col("n__") :+ col("m__"): _*)
      .agg(sum(abs(col("cumc__").cast("decimal(38,0)") * col("n__")
        - col("cumg__").cast("decimal(38,0)") * col("class_size")))
        .as("dev__"))
      .select(q ++ Seq(col("class_size"),
        ExactRound.ratioScaledBig(col("dev__"),
          col("class_size").cast("decimal(38,0)") * col("n__")
            * (col("m__") - lit(1L)), 6).as("emd_e6")): _*)
  }

  /** GENERALIZATION LADDER — the k-anonymization coarsening sweep
    * (Mondrian/Datafly's outer loop, reference: the same k-threshold
    * audits as [[kAnonymity]]): a numeric quasi-identifier is
    * bucketed at each candidate width and, per width, the audit
    * reports how far the (categorical, bucket) equivalence classes
    * are from k: class count, smallest class, rows living in
    * violating classes, and the k-ok verdict. The analyst picks the
    * narrowest passing width — the ladder emits all levels so the
    * utility/privacy trade stays visible.
    *
    * Bucketing is TRUE floor division (negative balances exist), the
    * pmod-subtract form on both engines. Shape at scale: one explode
    * of the |widths|-literal array (a documented |widths|× scan
    * fan-out — widths is 3-5 in practice), one groupBy to classes,
    * one groupBy to levels; nothing pairwise, no windows. */
  def generalizationLadder(df: DataFrame, quasiCat: String,
      quasiNumE2: Column, widths: Seq[Long], k: Long): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0) && k >= 1,
      "need positive widths and k >= 1")
    val rows = df.select(col(quasiCat).as("cat__"),
        quasiNumE2.cast("long").as("v__"))
      .select(col("cat__"), col("v__"),
        explode(array(widths.map(lit): _*)).as("width_e2"))
    val bucket = call_function("div",
      col("v__") - pmod(col("v__"), col("width_e2")), col("width_e2"))
    rows.groupBy(col("width_e2"), col("cat__"), bucket.as("bucket__"))
      .agg(count(lit(1)).as("sz__"))
      .groupBy(col("width_e2"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("sz__")).as("min_class_size"),
        sum(when(col("sz__") < k, col("sz__")).otherwise(0L))
          .cast("long").as("n_violating_rows"),
        (min(col("sz__")) >= k).as("k_ok"))
  }

  /** RECURSIVE (c,l)-diversity (Machanavajjhala et al., TKDD 2007 §4)
    * — the sharper rung between [[kAnonymity]]'s distinct-l flag and
    * [[tCloseness]]: a class can hold l distinct sensitive values yet
    * still leak when one value dominates ("99% of this zip's rows say
    * 'flu'"). Per equivalence class, rank sensitive values by
    * frequency (count desc, value asc — a total deterministic order)
    * and test r₁ < c · (r_l + r_{l+1} + …): the most common value must
    * be outweighed, by factor c, by the tail from rank l on. c ships
    * as the rational cNum/cDen so the comparison is exact integer
    * cross-multiplication — no float ever enters the verdict.
    *
    * Output per class: class size, distinct sensitive count, the top
    * frequency r1, the tail sum from rank l, and `recursive_ok`
    * (r1·cDen < cNum·tail; vacuously false when fewer than l distinct
    * values exist — the class fails plain l-diversity first).
    *
    * Shape at scale: one (class, value) count aggregate, one window
    * rank PARTITIONED BY CLASS over the distinct-value rows (bounded
    * by the sensitive domain, never the row count), one class
    * re-aggregate. */
  def recursiveLDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int, cNum: Long, cDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "recursive (c,l)-diversity needs l >= 2")
    require(cNum > 0 && cDen > 0, "c must be a positive rational")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("sv__")): _*)
      .agg(count(lit(1)).as("cnt__"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("cnt__").desc, col("sv__").asc)
    counts.withColumn("rk__", row_number().over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("cnt__")).cast("long").as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(when(col("rk__") === 1, col("cnt__"))).as("r1"),
        sum(when(col("rk__") >= l, col("cnt__")).otherwise(0L))
          .cast("long").as("tail_from_l"))
      .withColumn("recursive_ok",
        col("n_sensitive") >= l &&
          col("r1") * cDen < col("tail_from_l") * cNum)
  }
}
