package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification-quality metrics from a CONFUSION TABLE — per class,
  * tp/fp/fn plus precision/recall/F1 as exact e6-scaled integers: the
  * eval sheet a labeler/classifier run ends with, derived from any
  * (true, predicted, count) tally (e.g. the nearest-class-mean
  * confusion of q133). F1 reduces to the single rational
  * 2·tp / (n_true + n_pred) (= 2tp/(2tp+fp+fn)), so no intermediate
  * rounding compounds.
  *
  * Shape at scale: the confusion table is |classes|² rows at most —
  * driver-trivial by construction; everything here is three
  * aggregates over it and broadcast-sized joins. */
object EvalMetrics {

  def classMetrics(confusion: DataFrame, trueCol: String,
      predCol: String, nCol: String): DataFrame = {
    val classes = confusion.select(col(trueCol).as("label"))
      .union(confusion.select(col(predCol).as("label"))).distinct()
    val tp = confusion.filter(col(trueCol) === col(predCol))
      .groupBy(col(trueCol).as("label"))
      .agg(sum(col(nCol)).as("tp__"))
    val tc = confusion.groupBy(col(trueCol).as("label"))
      .agg(sum(col(nCol)).as("n_true__"))
    val pc = confusion.groupBy(col(predCol).as("label"))
      .agg(sum(col(nCol)).as("n_pred__"))
    classes
      .join(tp, Seq("label"), "left")
      .join(tc, Seq("label"), "left")
      .join(pc, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp__"), lit(0L)).as("tp"),
        (coalesce(col("n_pred__"), lit(0L)) -
          coalesce(col("tp__"), lit(0L))).as("fp"),
        (coalesce(col("n_true__"), lit(0L)) -
          coalesce(col("tp__"), lit(0L))).as("fn"),
        coalesce(col("n_true__"), lit(0L)).as("n_true"),
        coalesce(col("n_pred__"), lit(0L)).as("n_pred"))
      .select(col("label"), col("tp"), col("fp"), col("fn"),
        col("n_true"), col("n_pred"),
        graft.functions.ExactRound.ratioScaled(col("tp"),
          col("n_pred"), 6).as("precision_e6"),
        graft.functions.ExactRound.ratioScaled(col("tp"),
          col("n_true"), 6).as("recall_e6"),
        graft.functions.ExactRound.ratioScaled(col("tp") * 2,
          col("n_true") + col("n_pred"), 6).as("f1_e6"))
  }

  /** Cohen's kappa between two BOOLEAN judgments over the same rows —
    * chance-corrected agreement, the "do these two quality filters
    * measure the same thing?" number a curation pipeline reads before
    * swapping one filter for another. One aggregate pass yields the
    * 2×2 table (n, a-keeps, b-keeps, both); then
    * κ = (n·agree − E) / (n² − E) with E = na·nb + (n−na)(n−nb) —
    * a single exact rational, emitted e6-scaled through the DECIMAL
    * (38,0) path (n² overflows a long at real corpus sizes). κ is 0
    * when the chance term saturates (n² = E — both raters constant),
    * matching [[graft.functions.ExactRound.ratioScaledSigned]]'s
    * zero-on-empty-denominator contract.
    *
    * Shape at scale: one map-side-combinable aggregate over the
    * joined judgments; everything after is arithmetic on one row. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import graft.functions.ExactRound
    val agg = df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(aCol), 1L).otherwise(0L)).as("n_a_keep"),
      sum(when(col(bCol), 1L).otherwise(0L)).as("n_b_keep"),
      sum(when(col(aCol) && col(bCol), 1L).otherwise(0L))
        .as("n_both_keep"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val n = col("n_docs")
    val agree = lit(2L) * col("n_both_keep") + n -
      col("n_a_keep") - col("n_b_keep")
    val e = d(col("n_a_keep")) * d(col("n_b_keep")) +
      d(n - col("n_a_keep")) * d(n - col("n_b_keep"))
    agg.select(n, col("n_a_keep"), col("n_b_keep"), col("n_both_keep"),
      agree.as("n_agree"),
      ExactRound.ratioScaled(agree, n, 6).as("po_e6"),
      ExactRound.ratioScaledBig(e, d(n) * d(n), 6).as("pe_e6"),
      ExactRound.ratioScaledSigned(d(n) * d(agree) - e,
        d(n) * d(n) - e, 6).as("kappa_e6"))
  }

  /** Exact ROC-AUC (the Mann–Whitney statistic, tie-corrected) of an
    * integer score against a boolean outcome — "does the quality
    * model rank kept docs above dropped ones?", the threshold-free
    * companion to [[calibrationBins]]. Over all (positive, negative)
    * pairs, AUC = (wins + ties/2) / (n_pos·n_neg) with
    * wins = #{s_p > s_n}, ties = #{s_p = s_n} — a single exact
    * rational, emitted e6 through the DECIMAL(38,0) path (pair counts
    * square the corpus size). Gini = 2·AUC − 1 is rounded from the
    * same exact rational, not from the rounded AUC. Degenerate inputs
    * (no positives or no negatives) emit 0 on the zero-denominator
    * convention.
    *
    * Never pairwise: tally per DISTINCT score (map-side combinable),
    * then wins = Σ_s pos_s · (negatives strictly below s) with the
    * below-count from [[BudgetSelect.runningTotal]]'s range-
    * partitioned prefix sum — no single-partition window even when
    * every score is distinct; the finale is one global aggregate. */
  def rocAuc(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    import graft.functions.ExactRound
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val tally = df.select(col(scoreCol).cast("long").as("s__"),
        col(labelCol).cast("boolean").as("y__"))
      .groupBy(col("s__"))
      .agg(sum(when(col("y__"), 1L).otherwise(0L)).as("pos__"),
        sum(when(!col("y__"), 1L).otherwise(0L)).as("neg__"))
    val (cum, _) = BudgetSelect.runningTotal(tally, col("neg__"),
      Seq(col("s__")), "cumneg__")
    val agg = cum.agg(
      sum(col("pos__")).as("n_pos"),
      sum(col("neg__")).as("n_neg"),
      count(lit(1)).as("n_scores"),
      sum(d(col("pos__")) * d(col("cumneg__") - col("neg__")))
        .as("wins__"),
      sum(d(col("pos__")) * d(col("neg__"))).as("ties__"))
    val pairs = d(col("n_pos")) * d(col("n_neg"))
    val num2 = d(lit(2L)) * col("wins__") + col("ties__")
    agg.select(col("n_pos"), col("n_neg"), col("n_scores"),
      ExactRound.ratioScaledBig(num2, d(lit(2L)) * pairs, 6)
        .as("auc_e6"),
      ExactRound.ratioScaledSigned(num2 - pairs, pairs, 6)
        .as("gini_e6"))
  }

  /** Reliability diagram + expected calibration error (ECE) for a
    * scored filter against a boolean outcome — "when the quality
    * model says 0.7, is it right 70% of the time?" (Guo et al. 2017's
    * eval, the standard check before a scored filter's threshold is
    * trusted). Input: one row per doc with an e4-scaled integer score
    * (0..10000) and a boolean label. Scores bin equal-width into
    * `bins` buckets (top edge clamped into the last bin); per bin the
    * mean confidence and empirical positive rate are exact e6
    * rationals, and ECE = Σ n_b·|conf_b − acc_b| / N re-aggregates
    * the rounded per-bin gaps (both engines round the same sequence,
    * so the composition is gate-exact).
    *
    * Shape at scale: one map-side-combinable aggregate from corpus
    * rows down to ≤`bins` rows; the ECE window runs over that bounded
    * frame only (the Apportion precedent), never the corpus. */
  def calibrationBins(df: DataFrame, scoreE4Col: String,
      labelCol: String, bins: Int): DataFrame = {
    import graft.functions.ExactRound
    import org.apache.spark.sql.expressions.Window
    require(bins >= 1 && 10000 % bins == 0,
      "bins must divide the e4 score range")
    val width = 10000L / bins
    val all = Window.partitionBy()
    df.select(col(scoreE4Col).cast("long").as("s__"),
        col(labelCol).cast("boolean").as("y__"))
      // clamp the BIN, not the score: a perfect 1.0000 lands in the
      // top bin with its true value still in the confidence sum
      .groupBy(least(call_function("div", col("s__"), lit(width)),
        lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("s__")).as("sum_q__"),
        sum(when(col("y__"), 1L).otherwise(0L)).as("n_pos"))
      // mean of e4 scores re-scaled to e6: round(sum_q·100/n)
      .withColumn("conf_e6",
        ExactRound.ratioScaled(col("sum_q__"), col("n_rows"), 2))
      .withColumn("acc_e6",
        ExactRound.ratioScaled(col("n_pos"), col("n_rows"), 6))
      .withColumn("gap_e6", abs(col("conf_e6") - col("acc_e6")))
      .withColumn("ece_e6", ExactRound.ratioScaled(
        sum(col("n_rows") * col("gap_e6")).over(all),
        sum(col("n_rows")).over(all), 0))
      .select(col("bin"), col("n_rows"), col("n_pos"), col("conf_e6"),
        col("acc_e6"), col("gap_e6"), col("ece_e6"))
  }

  /** ISOTONIC regression calibration over score bins — the
    * monotone-repair step after [[calibrationBins]]' diagnosis (Zadrozny
    * & Elkan 2002: map raw scores to the best monotone-nondecreasing
    * positive-rate curve). Uses the minimax characterization of the
    * pool-adjacent-violators fit on the binned data:
    *
    *   fitted(i) = max_{j≤i} min_{k≥i} rate(j..k)
    *
    * where rate(j..k) is the pooled positive rate of occupied bins
    * j..k — exactly PAV's solution, computed as joins instead of the
    * inherently sequential pooling loop. Interval rates are exact e6
    * integers (pos·10⁶ over cnt via the ratioScaled ladder), and the
    * minimax runs over those integers, so the fit is gate-exact; the
    * ±1-ulp monotonicity slack from rounding BEFORE the minimax is
    * shared by both engines (documented, not observable at e6).
    *
    * Shape at scale: the corpus collapses to ≤`bins` rows in one
    * map-side-combinable aggregate; everything after — prefix sums,
    * the (j,k) interval table, the (i,j,k) minimax join — is O(bins³)
    * rows on a BOUNDED table (bins ≤ 20 by contract), the Apportion
    * allowance. Output: (bin, n_rows, n_pos, rate_e6, fitted_e6),
    * occupied bins only, fitted_e6 monotone nondecreasing in bin. */
  def isotonicCalibration(df: DataFrame, scoreE4Col: String,
      labelCol: String, bins: Int): DataFrame = {
    import graft.functions.ExactRound
    import org.apache.spark.sql.expressions.Window
    require(bins >= 1 && bins <= 20 && 10000 % bins == 0,
      "bins must divide the e4 score range and stay bounded")
    val width = 10000L / bins
    val b = df.select(col(scoreE4Col).cast("long").as("s__"),
        col(labelCol).cast("boolean").as("y__"))
      .groupBy(least(call_function("div", col("s__"), lit(width)),
        lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("y__"), 1L).otherwise(0L)).as("n_pos"))
    val ord = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = b
      .withColumn("pc__", sum(col("n_rows")).over(ord))
      .withColumn("pp__", sum(col("n_pos")).over(ord))
    val lo = pref.select(col("bin").as("j__"),
      (col("pc__") - col("n_rows")).as("pcj__"),
      (col("pp__") - col("n_pos")).as("ppj__"))
    val hi = pref.select(col("bin").as("k__"), col("pc__").as("pck__"),
      col("pp__").as("ppk__"))
    val intervals = lo.join(hi, col("j__") <= col("k__"))
      .select(col("j__"), col("k__"),
        ExactRound.ratioScaled(col("ppk__") - col("ppj__"),
          col("pck__") - col("pcj__"), 6).as("rate_e6__"))
    val anchors = b.select(col("bin"), col("n_rows"), col("n_pos"))
    val fitted = anchors
      .join(intervals,
        col("j__") <= col("bin") && col("k__") >= col("bin"))
      .groupBy(col("bin"), col("n_rows"), col("n_pos"), col("j__"))
      .agg(min(col("rate_e6__")).as("m__"))
      .groupBy(col("bin"), col("n_rows"), col("n_pos"))
      .agg(max(col("m__")).as("fitted_e6"))
    fitted.select(col("bin"), col("n_rows"), col("n_pos"),
      ExactRound.ratioScaled(col("n_pos"), col("n_rows"), 6)
        .as("rate_e6"),
      col("fitted_e6"))
  }

  /** Best DECISION-STUMP split of a boolean label on a numeric
    * feature — the univariate feature-selection primitive (CART/C4.5's
    * inner loop; "does doc length actually separate keep from drop?"):
    * among all thresholds t (split = value ≤ t), the one maximizing
    * the exact variance reduction of the 0/1 label,
    *
    *   Δ = (posL·nR − posR·nL)² / (n²·nL·nR)
    *
    * — for binary labels Gini reduction is exactly 2Δ, so the argmax
    * is the Gini-best split. Scored through the q253 two-stage
    * truncating ladder (d² would overflow 128 bits at corpus n):
    * q1 = (|d|·10³) div (nL·nR), score_e6 = (q1·|d|·10³) div n² —
    * identical in both engines, floor error immaterial to an argmax
    * at e6. Ties break to the SMALLEST threshold. The top row only:
    * (n, n_pos, best_threshold, score_e6, n_left, pos_left).
    *
    * Shape at scale: one distinct-value tally, two range-partitioned
    * running totals over it ([[BudgetSelect.runningTotal]] — no
    * global window), one codegen'd score projection, one
    * struct-max reduce. */
  def giniStump(df: DataFrame, labelCol: String,
      valueUnits: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val tally = df
      .select(valueUnits.cast("long").as("v__"),
        col(labelCol).cast("boolean").as("y__"))
      .filter(col("v__").isNotNull)
      .groupBy(col("v__"))
      .agg(count(lit(1)).as("cnt__"),
        sum(when(col("y__"), 1L).otherwise(0L)).as("pos__"))
    val (r1, nTotal) = BudgetSelect.runningTotal(tally, col("cnt__"),
      Seq(col("v__")), "cumn__")
    val (r2, posTotal) = BudgetSelect.runningTotal(r1, col("pos__"),
      Seq(col("v__")), "cump__")
    val nL = col("cumn__")
    val nR = lit(nTotal) - nL
    val d = abs(col("cump__").cast(dec) * nR -
      (lit(posTotal) - col("cump__")).cast(dec) * nL)
    val q1 = call_function("div", d * lit(1000L),
      nL.cast(dec) * nR)
    val score = call_function("div", q1.cast(dec) * d * lit(1000L),
      lit(nTotal).cast(dec) * lit(nTotal))
    r2.filter(nR > 0)
      .select(struct(score.as("s__"), (-col("v__")).as("nv__"),
        nL.as("nl__"), col("cump__").as("pl__")).as("c__"))
      .agg(max(col("c__")).as("b__"))
      // a 0/1-distinct-value input has no split: emit ZERO rows (the
      // oracle's LIMIT 1 over an empty candidate set), not a null row
      .filter(col("b__").isNotNull)
      .select(lit(nTotal).as("n"), lit(posTotal).as("n_pos"),
        (-col("b__.nv__")).as("best_threshold"),
        col("b__.s__").as("score_e6"),
        col("b__.nl__").as("n_left"),
        col("b__.pl__").as("pos_left"))
  }

  /** 1-NN LABEL PURITY over a scored neighbor-pair surface — "does my
    * similarity metric respect the labels?": each node's single best
    * neighbor (highest score, ties to the smallest neighbor id — a
    * total order) votes with its label, and per label the card
    * reports how many nodes have a neighbor at all and how often the
    * vote agrees (the embedding-quality eval next to [[rocAuc]] and
    * the nearest-class-mean confusion; SemDeDup-style pipelines read
    * exactly this before trusting a threshold). Nodes with no
    * qualifying pair are absent — their purity is undefined, not 0.
    *
    * Shape at scale: the pair surface is near-dup-sized; one
    * direction-doubling, one struct-max argmax per node (map-side
    * combinable), two label joins, one rollup. */
  def neighborLabelPurity(pairs: DataFrame, aCol: String, bCol: String,
      scoreE4: Column, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    import graft.functions.ExactRound
    val dir = pairs
      .select(col(aCol).as("id__"), col(bCol).as("nbr__"),
        scoreE4.cast("long").as("s__"))
      .union(pairs.select(col(bCol).as("id__"), col(aCol).as("nbr__"),
        scoreE4.cast("long").as("s__")))
    val best = dir
      .groupBy(col("id__"))
      .agg(max(struct(col("s__"), (-col("nbr__")).as("nn__")))
        .as("b__"))
      .select(col("id__"), (-col("b__.nn__")).as("nbr__"))
    val lab = labels.select(col(idCol).cast("long").as("id__"),
      col(labelCol).cast("long").as("l__"))
    best
      .join(lab, Seq("id__"))
      .join(lab.select(col("id__").as("nbr__"), col("l__").as("nl__")),
        Seq("nbr__"))
      .groupBy(col("l__").as("label"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("l__") === col("nl__"), 1L).otherwise(0L))
          .cast("long").as("n_agree"))
      .select(col("label"), col("n_nodes"), col("n_agree"),
        ExactRound.ratioScaled(col("n_agree"), col("n_nodes"), 6)
          .as("purity_e6"))
  }

  /** Decile LIFT / cumulative-GAIN table — the model-eval sheet next
    * to q215's ROC-AUC and q203's calibration: rows ranked by score
    * descending and cut into `buckets` equal-count slices; per slice
    * the positive rate, the lift over the base rate
    * (rate_slice / rate_overall as the exact rational
    * n_pos·n_total / (n_rows·pos_total)), and the cumulative share of
    * all positives captured so far (the gain curve a top-X% selection
    * policy reads). All counts integer, every ratio an exact-rounded
    * e6 scaled int.
    *
    * Determinism: the rank's sort key is (score DESC, id ASC) — with
    * a unique `idCol` the total order is unique, so bucket boundaries
    * cannot flap on score ties (mirror the same tie-break in any
    * oracle). Shape at scale: the rank is the range-partitioned
    * [[ScalableRank.withGlobalPosition]] path (no global window); the
    * bucket aggregate is map-side combinable; the only windows run
    * over the `buckets`-row table (bounded by construction). */
  def liftTable(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, buckets: Int = 10): DataFrame = {
    import graft.functions.ExactRound
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val ranked = ScalableRank.withGlobalPosition(
      df.select(col(idCol).as("id__"), col(scoreCol).as("s__"),
        col(labelCol).cast("boolean").as("y__")),
      Seq(col("s__").desc, col("id__").asc), nParts, "rn__")
    val n = ranked.agg(count(lit(1)).as("n_total"),
      sum(when(col("y__"), 1L).otherwise(0L)).as("pos_total"))
    val perBucket = ranked
      .crossJoin(broadcast(n))
      .groupBy(call_function("div",
          (col("rn__") - 1L) * buckets, col("n_total")).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("y__"), 1L).otherwise(0L)).as("n_pos"),
        first(col("n_total")).as("n_total__"),
        first(col("pos_total")).as("pos_total__"))
    val byBucket = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cum_pos__", sum(col("n_pos")).over(byBucket))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        ExactRound.ratioScaled(col("n_pos"), col("n_rows"), 6)
          .as("rate_e6"),
        ExactRound.ratioScaledBig(
          col("n_pos").cast("decimal(38,0)") * col("n_total__"),
          col("n_rows").cast("decimal(38,0)") * col("pos_total__"), 6)
          .as("lift_e6"),
        ExactRound.ratioScaled(col("cum_pos__"), col("pos_total__"), 6)
          .as("cum_gain_e6"))
  }

  /** RANK-BIASED OVERLAP (Webber, Moffat & Zobel, TOIS 2010) between
    * two rankings of the same items, per group — the
    * top-weighted "do these two orderings agree where it matters?"
    * score next to [[graft.operators.GroupStats.spearman]]'s
    * whole-list correlation: RBO = (1−p)·Σ_d p^(d−1)·overlap_d/d,
    * truncated at `depth` (the RBO_min lower bound; the geometric
    * tail is the unknowable extrapolation and is NOT added).
    *
    * Exactness: with p = pNum/pDen rational, each depth term
    * (1−p)·p^(d−1)·ov_d/d = pNum^(d−1)·(pDen−pNum)·ov_d /
    * (pDen^d·d) is an exact integer rational; terms ship FLOORED at
    * e6 (integer `div`, mirrored by the oracle's `//`) and summed —
    * per-term flooring is order-independent, so the result is
    * engine-exact. Rankings are (score DESC, id ASC) — totally
    * ordered via the unique id, so prefixes cannot flap on ties.
    *
    * Shape at scale: two [[RankOps.groupTopK]] rank-filter passes
    * (Catalyst's WindowGroupLimit keeps a size-`depth` heap per group
    * map-side), one join of two ≤depth·|groups| tables, `depth`
    * conditional aggregates, zero-overlap groups restored by a left
    * join from the distinct-group table. */
  def rankBiasedOverlap(df: DataFrame, groupCol: String, idCol: String,
      scoreA: Column, scoreB: Column, depth: Int = 10,
      pNum: Long = 9L, pDen: Long = 10L): DataFrame = {
    // depth cap keeps 1e6·pNum^(depth−1)·(pDen−pNum)·ov inside long
    // (at p = 9/10, depth 12: ~3.7e17 < 2^63)
    require(depth >= 1 && depth <= 12, "depth must be in [1, 12]")
    require(0 < pNum && pNum < pDen, "need 0 < pNum < pDen")
    // Non-default rationals can overflow the precomputed long term
    // constants (e.g. pDen ≥ 38 at depth 12 wraps pDen^12·12) — fail
    // loudly instead of silently wrapping. `ov ≤ depth` bounds the
    // numerator's runtime factor.
    require(BigInt(pDen).pow(depth) * depth <= Long.MaxValue,
      s"pDen^depth*depth overflows long (pDen=$pDen, depth=$depth)")
    require(BigInt(1000000L) * BigInt(pNum).pow(depth - 1) *
      (pDen - pNum) * depth <= Long.MaxValue,
      s"1e6*pNum^(depth-1)*(pDen-pNum)*depth overflows long " +
        s"(pNum=$pNum, pDen=$pDen, depth=$depth)")
    val base = df.select(col(groupCol).as("g__"), col(idCol).as("id__"),
      scoreA.as("sa__"), scoreB.as("sb__"))
    val ra = RankOps.groupTopK(base, Seq("g__"), depth, col("sa__"),
        Seq(col("id__")), rankCol = "ra__")
      .select(col("g__"), col("id__"), col("ra__"))
    val rb = RankOps.groupTopK(base, Seq("g__"), depth, col("sb__"),
        Seq(col("id__")), rankCol = "rb__")
      .select(col("g__"), col("id__"), col("rb__"))
    val joined = ra.join(rb, Seq("g__", "id__"))
      .select(col("g__"), greatest(col("ra__"), col("rb__")).as("md__"))
    val ovAggs = (1 to depth).map(d =>
      sum(when(col("md__") <= d, 1L).otherwise(0L)).cast("long")
        .as(s"ov__$d"))
    val ag = joined.groupBy(col("g__")).agg(ovAggs.head, ovAggs.tail: _*)
    def powL(b: Long, e: Int): Long = (1 to e).foldLeft(1L)((a, _) => a * b)
    val terms = (1 to depth).map { d =>
      val num = lit(1000000L * powL(pNum, d - 1) * (pDen - pNum)) *
        coalesce(col(s"ov__$d"), lit(0L))
      call_function("div", num, lit(powL(pDen, d) * d))
    }
    base.select(col("g__")).distinct()
      .join(ag, Seq("g__"), "left")
      .select(col("g__").as(groupCol),
        coalesce(col(s"ov__$depth"), lit(0L)).as("overlap_at_depth"),
        terms.reduce(_ + _).as("rbo_min_e6"))
  }

  /** BRIER SCORE with the Murphy (1973) decomposition — the
    * calibration card's summary row: over e6-scaled probabilities and
    * a boolean outcome,
    *   brier       = (1/N)·Σ (p − y)²,
    *   reliability = (1/N)·Σ_k n_k·(p̄_k − ȳ_k)²   (bin miscalibration),
    *   resolution  = (1/N)·Σ_k n_k·(ȳ_k − ȳ)²      (bin discrimination),
    *   uncertainty = ȳ·(1 − ȳ),
    * binned by equal-width probability bins (p = 10⁶ folds into the
    * top bin). Murphy's `brier = reliability − resolution +
    * uncertainty` is an identity only when forecasts are CONSTANT
    * within each bin (Murphy's discrete-forecast setting); binning a
    * continuous score leaves a non-negative within-bin-variance
    * residual, so the components are reported as diagnostics and the
    * identity is deliberately not part of the contract. Exact integer
    * lineage: bin means truncate once (`div` ↔ `//`, non-negative →
    * floor), the squared terms then aggregate in DECIMAL(38,0), and
    * each component ships as one truncating e6 quotient —
    * bit-identical across engines. O(N) single pass + a bins-sized
    * reduce; nothing pairwise. */
  def brierDecomposition(df: DataFrame, scoreE6Col: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && 1000000 % nBins == 0,
      s"nBins must divide 1e6, got $nBins")
    val dec = "decimal(38,0)"
    val p = col(scoreE6Col).cast("long")
    val y = when(col(labelCol).cast("boolean"), lit(1L))
      .otherwise(lit(0L))
    val rows = df.select(p.as("p__"), y.as("y__"),
      least(call_function("div", p, lit(1000000L / nBins)),
        lit(nBins - 1L)).as("bin__"))
    val byBin = rows.groupBy(col("bin__"))
      .agg(count(lit(1)).as("n__"),
        sum(col("p__")).cast("long").as("sp__"),
        sum(col("y__")).cast("long").as("sy__"),
        sum(((col("p__") - lit(1000000L) * col("y__")) *
          (col("p__") - lit(1000000L) * col("y__"))).cast(dec))
          .as("sq__"))
    val binStats = byBin.select(col("n__"), col("sy__"), col("sq__"),
      call_function("div", col("sp__"), col("n__")).as("pbar__"),
      call_function("div", col("sy__") * lit(1000000L), col("n__"))
        .as("ybar__"))
    val g = byBin.agg(sum(col("n__")).cast("long").as("nn__"),
        sum(col("sy__")).cast("long").as("gsy__"),
        sum(col("sq__")).as("gsq__"))
      .select(col("nn__"), col("gsy__"), col("gsq__"),
        call_function("div", col("gsy__") * lit(1000000L), col("nn__"))
          .as("gybar__"))
    binStats.crossJoin(broadcast(g))
      .agg(max(col("nn__")).as("n_rows"),
        max(col("gsy__")).as("gsy__"),
        max(col("gsq__")).as("gsq__"),
        sum(((col("pbar__") - col("ybar__")) *
          (col("pbar__") - col("ybar__"))).cast(dec) * col("n__"))
          .as("rel__"),
        sum(((col("ybar__") - col("gybar__")) *
          (col("ybar__") - col("gybar__"))).cast(dec) * col("n__"))
          .as("res__"))
      .select(col("n_rows"),
        call_function("div", col("gsq__"),
          col("n_rows").cast(dec) * lit(1000000L)).cast("long")
          .as("brier_e6"),
        call_function("div", col("rel__"),
          col("n_rows").cast(dec) * lit(1000000L)).cast("long")
          .as("reliability_e6"),
        call_function("div", col("res__"),
          col("n_rows").cast(dec) * lit(1000000L)).cast("long")
          .as("resolution_e6"),
        call_function("div",
          col("gsy__").cast(dec) * (col("n_rows") - col("gsy__")) *
            lit(1000000L),
          col("n_rows").cast(dec) * col("n_rows")).cast("long")
          .as("uncertainty_e6"))
  }
}
