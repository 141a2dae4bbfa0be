package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-accumulator bivariate group statistics — Pearson correlation
  * (and the covariance it rides on) per group, computed the way every
  * order-sensitive statistic here is (the q07 discipline): all sums run
  * through EXACT integer-unit decimal accumulators — invariant to
  * partition order — and one double formula at the very end, mirrored
  * verbatim in the oracle. Spark's builtin `corr` is a streaming
  * co-moment recursion whose float result depends on partial-aggregate
  * order; it can flap the correctness gate between runs.
  *
  * Pearson r is scale-invariant, so both inputs are first quantized to
  * integer units (e.g. cents) — the five sums Σx, Σy, Σx², Σy², Σxy are
  * then exact integers (DECIMAL(38,0); magnitudes up to ~1e25 at fleet
  * group sizes, well inside 38 digits), and
  *
  *   r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
  *
  * has an exactly-determined numerator and variance terms; the only
  * float ops are two correctly-rounded decimal→double casts, two IEEE
  * sqrts, and one division — bit-equal across engines (oracle side
  * casts via VARCHAR per the 2⁵³ lesson in README). A zero-variance
  * side yields NULL r (undefined, not 0). */
object GroupStats {

  /** Per-group n, covariance numerator, and Pearson r (rounded to
    * `roundTo`) over integer-unit expressions `xUnits`, `yUnits`. */
  def pearson(df: DataFrame, groupCols: Seq[String],
      xUnits: Column, yUnits: Column, roundTo: Int = 6): DataFrame = {
    val dec = "decimal(38,0)"
    val sums = df
      .select(groupCols.map(col) :+ xUnits.cast(dec).as("x__") :+
        yUnits.cast(dec).as("y__"): _*)
      .filter(col("x__").isNotNull && col("y__").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x__")).as("sx"),
        sum(col("y__")).as("sy"),
        sum((col("x__") * col("x__")).cast(dec)).as("sxx"),
        sum((col("y__") * col("y__")).cast(dec)).as("syy"),
        sum((col("x__") * col("y__")).cast(dec)).as("sxy"))
    val n = col("n").cast(dec)
    val num = (n * col("sxy") - col("sx") * col("sy")).cast(dec)
    val vx = (n * col("sxx") - col("sx") * col("sx")).cast(dec)
    val vy = (n * col("syy") - col("sy") * col("sy")).cast(dec)
    sums
      .withColumn("cov_num", num.cast("double"))
      .withColumn("r",
        when(vx > 0 && vy > 0,
          round(num.cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), roundTo)))
      .select(groupCols.map(col) :+ col("n") :+ col("cov_num") :+
        col("r"): _*)
  }

  /** Per-group SPEARMAN rank correlation — Pearson over tie-averaged
    * ranks, the monotonic-association eval next to [[pearson]]'s
    * linear one. Exactness trick: the tie-averaged rank of a value
    * with `below` smaller rows and `ties` equals is
    * (2·below + ties + 1) / 2; Pearson is scale-invariant, so the
    * DOUBLED rank `2·below + ties + 1` — always an integer — feeds
    * the same exact-DECIMAL sum discipline, and tie correction falls
    * out for free. Ranks come from a per-group DISTINCT-value tally +
    * a below-count window over the tally (rows = distinct values, not
    * the corpus — the q215 shape), joined back to rows.
    *
    * Same output contract as [[pearson]]: n, cov_num (over doubled
    * ranks), rho (NULL when either side is constant). */
  def spearman(df: DataFrame, groupCols: Seq[String],
      xUnits: Column, yUnits: Column, roundTo: Int = 6): DataFrame = {
    val base = df
      .select(groupCols.map(col) :+ xUnits.cast("long").as("x__") :+
        yUnits.cast("long").as("y__"): _*)
      .filter(col("x__").isNotNull && col("y__").isNotNull)
    // below-counts ride the range-partitioned prefix sum (the q215
    // discipline) — a window partitioned by the few group keys would
    // put one group's whole distinct-value spectrum in one task. The
    // global running sum re-bases per group via min(run − cnt) (= the
    // group's first exclusive prefix, since running is monotone).
    def rank2(vCol: String, out: String): DataFrame = {
      val tally = base
        .groupBy(groupCols.map(col) :+ col(vCol): _*)
        .agg(count(lit(1)).as("cnt__"))
      val (cum, _) = BudgetSelect.runningTotal(tally, col("cnt__"),
        groupCols.map(col) :+ col(vCol), "run__")
      val off = cum.groupBy(groupCols.map(col): _*)
        .agg(min(col("run__") - col("cnt__")).as("off__"))
        .select(groupCols.map(g => col(g).as(s"graft_g_${g}__")) :+
          col("off__"): _*)
      val cond = groupCols.map(g => col(g) <=> col(s"graft_g_${g}__"))
        .reduce(_ && _)
      cum.join(off, cond)
        .select(groupCols.map(col) :+ col(vCol) :+
          (lit(2L) * (col("run__") - col("cnt__") - col("off__")) +
            col("cnt__") + 1L).as(out): _*)
    }
    val ranked = base
      .join(rank2("x__", "rx2__"), groupCols :+ "x__")
      .join(rank2("y__", "ry2__"), groupCols :+ "y__")
    pearson(ranked, groupCols, col("rx2__"), col("ry2__"), roundTo)
      .withColumnRenamed("r", "rho")
  }

  /** Per-group OLS trend line over integer-unit observations — the
    * group-wise drift detector (is this source's quality declining? is
    * this metric trending?): slope and intercept of y ~ x as EXACT
    * scaled rationals, no float anywhere in the lineage.
    *
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·vx − num·Σx) / (n·vx)     (vx = the denominator)
    *
    * Both ship as e6-scaled longs rounded half-AWAY-from-zero — the
    * signed counterpart of the ExactRound identity,
    * sign·((|a|·2e6 + |b|) div (2|b|)), mirrored verbatim in the
    * oracle — so two engines agree bit for bit. Zero-variance x yields
    * NULLs. Magnitude headroom: Σy·vx ≲ n³·x²·y — with cent-scale
    * units that stays inside DECIMAL(38,0) to ~1e9 rows per group.
    * Same one-pass combinable-aggregate shape as [[pearson]]. */
  def olsTrend(df: DataFrame, groupCols: Seq[String],
      xUnits: Column, yUnits: Column): DataFrame = {
    val dec = "decimal(38,0)"
    def e6RoundSigned(num: Column, den: Column): Column = {
      val s = signum(num.cast("double")) * signum(den.cast("double"))
      val q = call_function("div",
        abs(num).cast(dec) * lit(2000000L) + abs(den).cast(dec),
        abs(den).cast(dec) * lit(2L))
      s.cast("long") * q.cast("long")
    }
    val sums = df
      .select(groupCols.map(col) :+ xUnits.cast(dec).as("x__") :+
        yUnits.cast(dec).as("y__"): _*)
      .filter(col("x__").isNotNull && col("y__").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x__")).as("sx"),
        sum(col("y__")).as("sy"),
        sum((col("x__") * col("x__")).cast(dec)).as("sxx"),
        sum((col("x__") * col("y__")).cast(dec)).as("sxy"))
    val n = col("n").cast(dec)
    val num = (n * col("sxy") - col("sx") * col("sy")).cast(dec)
    val vx = (n * col("sxx") - col("sx") * col("sx")).cast(dec)
    val iNum = (col("sy") * vx - num * col("sx")).cast(dec)
    val iDen = (n * vx).cast(dec)
    sums
      .withColumn("slope_e6", when(vx > 0, e6RoundSigned(num, vx)))
      .withColumn("intercept_e6", when(vx > 0, e6RoundSigned(iNum, iDen)))
      .select(groupCols.map(col) :+ col("n") :+ col("slope_e6") :+
        col("intercept_e6"): _*)
  }

  /** Per-group TWO-REGRESSOR OLS — y = β0 + β1·x1 + β2·x2 via the
    * normal equations in centered form, solved by Cramer's rule on
    * exact integer sums ([[olsTrend]]'s big sibling; the "quality ~
    * length + punctuation" style multi-feature fit a curation
    * pipeline runs before trusting a single-feature story):
    *
    *   A11 = n·S11 − S1², A12 = n·S12 − S1·S2, A22 = n·S22 − S2²
    *   b1  = n·S1y − S1·Sy, b2 = n·S2y − S2·Sy, det = A11·A22 − A12²
    *   β1 = (b1·A22 − b2·A12)/det, β2 = (b2·A11 − b1·A12)/det
    *   β0 = round((Sy·10⁶ − β1_e6·S1 − β2_e6·S2) / n)
    *
    * Every sum and every Cramer numerator/denominator is DECIMAL(38,0)
    * (HUGEINT on the oracle side); the final βs are signed exact-e6
    * roundings of integer rationals. β0 deliberately derives from the
    * ALREADY-ROUNDED slopes (a two-stage ladder, mirrored verbatim by
    * the oracle): the exact form Sy·det/(n·det) is QUINTIC in group
    * size × unit range and overflows 128 bits around n ≈ 10⁶ at e5
    * units (found by the 2M scale probe — ANSI Spark throws, it does
    * not null), while the staged form is bounded by max(|β|)·|S| and
    * holds to n ≈ 10⁹. Slope headroom (the quartic b·A products) holds
    * to n ≈ 3·10⁷ at e5-unit regressors; a larger corpus coarsens
    * units first (the documented trade, same as the q116 OLS ladder).
    * Collinear regressors (det ≤ 0) yield NULL βs.
    *
    * Shape at scale: one map-side-combinable 9-sum aggregate; no
    * windows, no second pass. */
  def ols2(df: DataFrame, groupCols: Seq[String], x1Units: Column,
      x2Units: Column, yUnits: Column): DataFrame = {
    val dec = "decimal(38,0)"
    def e6RoundSigned(num: Column, den: Column): Column = {
      val s = signum(num.cast("double")) * signum(den.cast("double"))
      val q = call_function("div",
        abs(num).cast(dec) * lit(2000000L) + abs(den).cast(dec),
        abs(den).cast(dec) * lit(2L))
      s.cast("long") * q.cast("long")
    }
    val sums = df
      .select(groupCols.map(col) :+ x1Units.cast(dec).as("x1__") :+
        x2Units.cast(dec).as("x2__") :+ yUnits.cast(dec).as("y__"): _*)
      .filter(col("x1__").isNotNull && col("x2__").isNotNull &&
        col("y__").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x1__")).as("s1"),
        sum(col("x2__")).as("s2"),
        sum(col("y__")).as("sy"),
        sum((col("x1__") * col("x1__")).cast(dec)).as("s11"),
        sum((col("x2__") * col("x2__")).cast(dec)).as("s22"),
        sum((col("x1__") * col("x2__")).cast(dec)).as("s12"),
        sum((col("x1__") * col("y__")).cast(dec)).as("s1y"),
        sum((col("x2__") * col("y__")).cast(dec)).as("s2y"))
    val n = col("n").cast(dec)
    val a11 = (n * col("s11") - col("s1") * col("s1")).cast(dec)
    val a12 = (n * col("s12") - col("s1") * col("s2")).cast(dec)
    val a22 = (n * col("s22") - col("s2") * col("s2")).cast(dec)
    val b1 = (n * col("s1y") - col("s1") * col("sy")).cast(dec)
    val b2 = (n * col("s2y") - col("s2") * col("sy")).cast(dec)
    val det = (a11 * a22 - a12 * a12).cast(dec)
    val n1 = (b1 * a22 - b2 * a12).cast(dec)
    val n2 = (b2 * a11 - b1 * a12).cast(dec)
    val iNum = (col("sy").cast(dec) * lit(1000000L) -
      col("beta1_e6").cast(dec) * col("s1") -
      col("beta2_e6").cast(dec) * col("s2")).cast(dec)
    sums
      .withColumn("beta1_e6", when(det > 0, e6RoundSigned(n1, det)))
      .withColumn("beta2_e6", when(det > 0, e6RoundSigned(n2, det)))
      .withColumn("beta0_e6",
        when(det > 0, graft.functions.ExactRound
          .ratioScaledSigned(iNum, n, 0)))
      .select(groupCols.map(col) :+ col("n") :+ col("beta1_e6") :+
        col("beta2_e6") :+ col("beta0_e6"): _*)
  }

  /** Majority-vote label resolution — the multi-annotator (or
    * multi-model) label-merge step of a training-data pipeline: per
    * key, the label with the most votes, with ties broken by label
    * ascending (deterministic, engine-mirrorable), plus the vote
    * tally and an exact-scaled agreement rate
    * (`agreement_e4` = round(1e4·top_votes/total_votes) via the
    * [[graft.functions.ExactRound]] identity). An agreement rate
    * below ~0.5e4 is the "annotators disagree — route to review"
    * signal; q101's label-noise pairs find cross-item inconsistency,
    * this finds within-item inconsistency.
    *
    * Shape at scale: one map-side-combinable groupBy to (key, label)
    * counts, then one window family over the (typically tiny) label
    * multiplicity per key. No driver state. */
  def majorityLabel(df: DataFrame, keyCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .groupBy(col(keyCol), col(labelCol).as("majority_label"))
      .agg(count(lit(1)).as("n_votes"))
    val byKey = Window.partitionBy(col(keyCol))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(col("n_votes").desc, col("majority_label").asc)
    counts
      .withColumn("n_total", sum(col("n_votes")).over(byKey))
      .withColumn("n_labels", count(lit(1)).over(byKey))
      .withColumn("rn__", row_number().over(pick))
      .filter(col("rn__") === 1)
      .select(col(keyCol), col("majority_label"), col("n_votes"),
        col("n_total"), col("n_labels"),
        graft.functions.ExactRound.ratioScaled(
          col("n_votes"), col("n_total"), 4).as("agreement_e4"))
  }

  /** Per-group LOWER weighted median — the smallest value whose
    * cumulative weight reaches half the group's total
    * (2·cum(v) >= W): the robust center of a weighted distribution
    * ("median doc quality weighted by tokens"), exact-integer end to
    * end — no interpolation, so the result is always an observed
    * value and engine-exact. Rows with NULL or non-positive weight
    * are excluded (they cannot carry mass).
    *
    * Deterministic under ties: among equal values the cumulative
    * weight crosses W/2 somewhere inside the run, and min(v) over the
    * crossing rows is that value regardless of intra-run order.
    *
    * Shape at scale: one per-group cumulative-weight window (the
    * [[RobustScore.madZScore]] window form; a corpus dominated by one
    * group should rank via [[ScalableRank.groupRowNumber]] instead),
    * then a map-side-combinable min/max aggregate. */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valueUnits: Column, weightUnits: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val base = df
      .select(gcols :+ valueUnits.cast("long").as("v__") :+
        weightUnits.cast("long").as("w__"): _*)
      .filter(col("v__").isNotNull && col("w__") > 0L)
    val cumW = Window.partitionBy(gcols: _*).orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(gcols: _*)
    base
      .withColumn("cum__", sum(col("w__")).over(cumW))
      .withColumn("W__", sum(col("w__")).over(totW))
      .filter(col("cum__") * 2 >= col("W__"))
      .groupBy(gcols: _*)
      .agg(min(col("v__")).as("wmedian_units"),
        max(col("W__")).as("w_total"))
  }

  /** Per-group exact TRIMMED mean — drop the lowest and highest
    * floor(n·trimNum/trimDen) values, average the rest: the
    * outlier-robust location estimate between the mean (trim 0) and
    * the median (trim→50%), reported as an exact e4-scaled integer
    * over integer units (non-negative units — the rounding identity's
    * domain). Boundary ties are value-equal by construction (rank
    * cuts at a value boundary can only split EQUAL values), so the
    * kept-sum is deterministic under any tie order.
    *
    * Shape at scale: ranks via [[ScalableRank.groupRowNumber]]'s
    * range-partitioned sort (no one-task group window), then one
    * map-side-combinable sum. */
  def trimmedMean(df: DataFrame, groupCols: Seq[String],
      valueUnits: Column, trimNum: Int = 1,
      trimDen: Int = 10): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && 2 * trimNum < trimDen,
      "trim fraction must be in [0, 1/2)")
    val dec = "decimal(38,0)"
    val units = df
      .select(groupCols.map(col) :+ valueUnits.cast("long").as("u__"): _*)
      .filter(col("u__").isNotNull)
    val ranked = ScalableRank.groupRowNumber(units, groupCols,
      Seq(col("u__").asc), rnCol = "rn__", nCol = "n__")
    ranked
      .withColumn("t__", expr(s"(n__ * $trimNum) div $trimDen"))
      .filter(col("rn__") > col("t__") &&
        col("rn__") <= col("n__") - col("t__"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("n__")).as("n_total"),
        count(lit(1)).as("n_kept"),
        sum(col("u__").cast(dec)).cast("long").as("sum_kept_units"))
      .withColumn("trimmed_mean_e4",
        graft.functions.ExactRound.ratioScaled(col("sum_kept_units"),
          col("n_kept"), 4))
  }

  /** Per-group exact quantile grid — the value AT rank
    * ceil(q·n/1000) for each requested permille q (the lower/type-7
    * "no interpolation" convention: every reported quantile is an
    * OBSERVED value, so the surface is type-preserving and
    * engine-exact — the [[weightedMedian]] discipline, against
    * [[Winsorize]]'s lerp form which exists for clip bounds). One
    * rank pass, one conditional-max aggregate; adding a quantile
    * adds a column, never a pass.
    *
    * Shape at scale: one per-group window sort (the
    * [[RobustScore.madZScore]] window form — rank via
    * [[ScalableRank.groupRowNumber]] when one group dominates), then
    * a map-side-combinable aggregate. */
  /** ANOVA effect size — ETA SQUARED (SS_between / SS_total) of a
    * numeric column across groups, as one e6 integer: "how much of
    * the value's variance does the grouping explain?" — the
    * effect-size companion to [[chiSquare]]'s categorical
    * independence and the q261 regressions. Integer form:
    * SS_between·10⁶ = Σ_g (s_g²·10⁶ div n_g) − (S²·10⁶ div N) and
    * SS_total·10⁶ = Σx²·10⁶ − (S²·10⁶ div N), each term floored once
    * (order-independent, mirrored by the oracle's `//`), with the
    * numerator clamped at 0 against flooring dust. A constant column
    * reads 0 by the zero-denominator convention.
    *
    * Shape at scale: one per-group aggregate (Σ, Σ², n — map-side
    * combinable, Σ² in DECIMAL(38,0)) and a |groups|-row rollup. */
  def etaSquared(df: DataFrame, groupCol: String,
      valueUnits: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    // exact floor division that STAYS in DECIMAL(38,0): Spark's `div`
    // always returns LONG, and a per-group s²·10⁶/n term exceeds long
    // at corpus scale (the 2M probe tripped ANSI overflow) — subtract
    // the remainder, then the division is exact and representable.
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    val pg = df.select(col(groupCol).as("g__"),
        valueUnits.cast("long").as("v__"))
      .filter(col("v__").isNotNull)
      .groupBy(col("g__"))
      .agg(count(lit(1)).as("n__"),
        sum(col("v__")).cast("long").as("s__"),
        sum(dec(col("v__")) * col("v__")).as("q__"))
    val t = pg.agg(sum(col("n__")).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_groups"),
      sum(col("s__")).cast("long").as("st__"),
      sum(col("q__")).as("qt__"),
      sum(fdiv(dec(col("s__")) * col("s__") * lit(1000000L),
        dec(col("n__")))).as("b6__"))
    val gm = fdiv(dec(col("st__")) * col("st__") * lit(1000000L),
      dec(col("n_rows")))
    val den = dec(col("qt__")) * lit(1000000L) - gm
    t.select(col("n_rows"), col("n_groups"),
      when(den > lit(0L),
        fdiv(greatest(dec(col("b6__")) - gm,
          lit(0L).cast("decimal(38,0)")) * lit(1000000L), den)
          .cast("long"))
        .otherwise(lit(0L)).as("eta2_e6"))
  }

  def quantileGrid(df: DataFrame, groupCols: Seq[String],
      valueUnits: Column,
      permilles: Seq[Int] = Seq(250, 500, 750, 950)): DataFrame = {
    require(permilles.nonEmpty &&
      permilles.forall(q => q >= 1 && q <= 1000),
      "permilles in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("u__"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranked = df
      .select(gcols :+ valueUnits.cast("long").as("u__"): _*)
      .filter(col("u__").isNotNull)
      .withColumn("rn__", row_number().over(w).cast("long"))
      .withColumn("n__", count(lit(1)).over(wAll))
    // ceil(q·n/1000) as pure integer arithmetic
    def rankFor(q: Int): Column =
      graft.functions.TimeFns.floorDiv(
        col("n__") * q.toLong + 999L, 1000L)
    val aggs = count(lit(1)).as("n") +: permilles.map(q =>
      max(when(col("rn__") === rankFor(q), col("u__")))
        .as(s"p${q}_units"))
    ranked.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group Gini diversity of a categorical column —
    * 1 − Σᵢ pᵢ² as an exact e6 rational ((N²−Σnᵢ²)/N²): the
    * composition-diversity score of a training mix (0 = one category
    * dominates totally, →1 = evenly spread). Entropy would say the
    * same thing through a log; Gini says it through integers, so the
    * gate surface stays engine-exact (the q85/q125 discipline).
    *
    * Shape at scale: two stacked map-side-combinable groupBys
    * ((group, cat) counts, then per-group Σn/Σn²/k) — no windows, no
    * driver state. */
  def giniDiversity(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("n__"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("n__")).cast(dec).as("N__"),
        sum((col("n__").cast(dec) * col("n__")).cast(dec)).as("ss__"),
        count(lit(1)).as("n_cats"))
      .select(col(groupCol), col("N__").cast("long").as("n_rows"),
        col("n_cats"),
        graft.functions.ExactRound.ratioScaledBig(
          col("N__") * col("N__") - col("ss__"),
          col("N__") * col("N__"), 6).as("gini_e6"))
  }

  /** Pearson CHI-SQUARED test of independence between two categorical
    * columns, plus Cramér's V² — "is the language mix independent of
    * the source?", the association audit a mixture designer runs
    * before treating (source, lang) shares as a product of marginals.
    * Entirely integer lineage (the [[giniDiversity]] / q85 gate
    * discipline): per cell of the full r×c grid (EMPTY cells
    * included — they carry expected mass Ra·Cb/N too),
    *
    *   χ² cell term = (O·N − Ra·Cb)² / (N·Ra·Cb)
    *
    * evaluated as a documented two-stage truncating-division ladder
    * (diff² would need 2·log₁₀N² ≈ 40+ digits at fleet N and overflow
    * even 128-bit; the staged form caps intermediates at ~1e26):
    *
    *   q1      = (|diff| · 10³) div (Ra·Cb)
    *   term_e6 = (q1 · |diff| · 10³) div N          -- e6-scaled
    *
    * Both engines run the identical ladder, so the sum is gate-exact;
    * the ladder's floor error per cell is < 10⁻³·|diff|/N relative —
    * noise against any χ² threshold. V² = χ²/(N·min(r−1,c−1)) stays a
    * truncating e6 integer (squared form for the same reason q214
    * ships cos²: no sqrt on the gate surface).
    *
    * Shape at scale: one (a,b) count aggregate over the corpus, two
    * bounded marginal re-aggregates, and an r×c BROADCAST cross grid
    * (categories, not rows — the contingency table itself); no
    * windows, no driver state. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = graft.Caches.register(df
      .select(col(aCol).as("a__"), col(bCol).as("b__"))
      .filter(col("a__").isNotNull && col("b__").isNotNull)
      .groupBy(col("a__"), col("b__"))
      .agg(count(lit(1)).as("o__"))
      .persist())
    val ra = cells.groupBy(col("a__")).agg(sum(col("o__")).as("ra__"))
    val cb = cells.groupBy(col("b__")).agg(sum(col("o__")).as("cb__"))
    val tot = cells.agg(sum(col("o__")).as("n__"),
      count_distinct(col("a__")).as("r__"),
      count_distinct(col("b__")).as("c__"))
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a__", "b__"), "left")
      .crossJoin(broadcast(tot))
    val diff = abs(coalesce(col("o__"), lit(0L)).cast(dec) * col("n__") -
      col("ra__").cast(dec) * col("cb__"))
    val q1 = call_function("div", diff * lit(1000L),
      col("ra__").cast(dec) * col("cb__"))
    val term = call_function("div",
      q1.cast(dec) * diff * lit(1000L), col("n__").cast(dec))
    grid
      .select(col("n__"), col("r__"), col("c__"), term.as("t__"))
      .groupBy(col("n__"), col("r__"), col("c__"))
      .agg(sum(col("t__")).as("chi2_e6"))
      .select(col("n__").as("n"), col("r__").as("r_levels"),
        col("c__").as("c_levels"),
        ((col("r__") - 1L) * (col("c__") - 1L)).as("dof"),
        col("chi2_e6").cast("long").as("chi2_e6"),
        // a single-level factor (dof 0) has no association to
        // normalize — emit 0, not a division by zero (DuckDB's //
        // would error where Spark nulls; neither is the contract)
        when(least(col("r__") - 1L, col("c__") - 1L) > 0,
          call_function("div", col("chi2_e6").cast(dec),
            col("n__").cast(dec) *
              least(col("r__") - 1L, col("c__") - 1L)))
          .otherwise(lit(0L)).as("v2_e6"))
  }

  /** CONCENTRATION card per group — how unequal is a value's
    * distribution across a group's members? Two classical indices as
    * exact rationals:
    *
    *  - Gini_e6: from the sorted form `G = (2·Σ rnᵢ·xᵢ − (n+1)·Σx) /
    *    (n·Σx)` with rows ranked ascending by (value, id) — the
    *    prefix-rank identity of the Lorenz-area definition, 0 for
    *    equal shares, →1 as one member takes all.
    *  - HHI_e6: Herfindahl–Hirschman `Σ (xᵢ/Σx)²` — the
    *    concentration index regulators use; 1e6/n for equal shares,
    *    1e6 for a monopoly.
    *
    * "Half the corpus's tokens sit in 2% of its documents" is the
    * curation fact both indices compress.
    *
    * Exactness: ranks come from [[ScalableRank.groupRowNumber]]
    * (range-partitioned, skew-proof — no per-group window); sums are
    * DECIMAL(38,0) (a corpus-scale Σ rn·x exceeds long), ratios ride
    * [[graft.functions.ExactRound.ratioScaledBig]] (the denominator
    * n·Σx / (Σx)² exceeds long long before the data stops fitting).
    * Negative-free by construction: sorted-ascending ranks make the
    * Gini numerator ≥ 0. */
  def concentration(df: DataFrame, groupCol: String, idCol: String,
      value: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(col(groupCol), col(idCol), value.as("x__"))
    val ranked = ScalableRank.groupRowNumber(base, Seq(groupCol),
      Seq(col("x__"), col(idCol)), rnCol = "rn__", nCol = "n__")
    ranked
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum(col("x__").cast(dec)).as("tot__"),
        sum(((col("rn__") * 2L - col("n__") - 1L) * col("x__"))
          .cast(dec)).as("gnum__"),
        sum((col("x__") * col("x__")).cast(dec)).as("sq__"))
      .select(col(groupCol), col("n_members"),
        col("tot__").cast("long").as("total"),
        graft.functions.ExactRound.ratioScaledBig(col("gnum__"),
          col("n_members").cast(dec) * col("tot__"), 6).as("gini_e6"),
        graft.functions.ExactRound.ratioScaledBig(col("sq__"),
          col("tot__") * col("tot__"), 6).as("hhi_e6"))
  }
}
