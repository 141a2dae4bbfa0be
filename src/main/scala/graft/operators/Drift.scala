package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Distribution-drift report between a reference and a current
  * dataset — the monitoring primitive that catches "today's scrape
  * came back with a shifted value distribution" before it propagates
  * (the reference's cron flow re-uploads whatever it scraped;
  * `checkdb.py` counts rows but never looks at the SHAPE of the
  * data). Bins are equal-frequency deciles OF THE REFERENCE (the
  * standard PSI/KS binning), both sides are assigned to those bins by
  * VALUE, and the drift statistic is the exact total-variation
  * distance — all integer/rational, so the gate surface is
  * engine-exact (PSI's log stays out, per the q85/q125 discipline;
  * TVD ranks drift the same way for monitoring purposes).
  *
  * Shape at scale: reference ranks come from the
  * [[BudgetSelect.runningTotal]] distributed prefix sum (range
  * partition + per-partition offsets — no single-task sort);
  * boundaries are O(nBins) driver state (the k-centroid allowance);
  * bin assignment is a codegen'd when-chain (no join); per-bin counts
  * are map-side-combinable; the final share/TVD pass is one window
  * over <= nBins rows.
  *
  * Rank ties: equal values may receive their consecutive ranks in any
  * order, but the VALUE at rank r is deterministic, so per-rank-bin
  * maxima — the boundaries — are deterministic, and value-based
  * assignment puts equal values in the same bin on both engines.
  */
object Drift {

  /** Per-bin drift rows: (bin, hi_units, n_ref, n_cur, share_ref_e6,
    * share_cur_e6, tvd_e6) — `hi_units` the bin's inclusive upper
    * boundary (NULL for the top bin), `tvd_e6` the corpus-level exact
    * TVD repeated per row. `valueUnits` must be an integral-unit
    * expression (cents, not dollars); NULL values are excluded on
    * both sides. */
  def binDrift(ref: DataFrame, cur: DataFrame, valueUnits: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    import org.apache.spark.sql.expressions.Window
    val spark = ref.sparkSession
    import spark.implicits._
    val refV = ref.select(valueUnits.cast("long").as("v__"))
      .filter(col("v__").isNotNull)
    val curV = cur.select(valueUnits.cast("long").as("v__"))
      .filter(col("v__").isNotNull)
    val (ranked, nRef) =
      BudgetSelect.runningTotal(refV, lit(1L), Seq(col("v__")), "rn__")
    // boundary of rank-bin b = max value among ranks with
    // floor((rn-1)·nBins/nRef) = b, for b < nBins-1 — O(nBins) rows
    // of driver state, the same allowance as IVF centroids
    val bounds: Array[Long] =
      if (nRef == 0) Array.empty
      else ranked
        .withColumn("bin__", graft.functions.TimeFns.floorDiv(
          (col("rn__") - 1L) * lit(nBins.toLong), nRef))
        .filter(col("bin__") < (nBins - 1).toLong)
        .groupBy(col("bin__")).agg(max(col("v__")).as("b__"))
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    def binOf(v: Column): Column = bounds.foldLeft(lit(0L)) {
      (acc, b) => acc + when(v > b, 1L).otherwise(0L)
    }
    val rc = refV.groupBy(binOf(col("v__")).as("bin"))
      .agg(count(lit(1)).as("n_ref"))
    val cc = curV.groupBy(binOf(col("v__")).as("bin"))
      .agg(count(lit(1)).as("n_cur"))
    val boundsDf = bounds.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toSeq.toDF("bin", "hi_units")
    val dec = "decimal(38,0)"
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    rc.join(cc, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .join(broadcast(boundsDf), Seq("bin"), "left")
      .withColumn("nc__", sum(col("n_cur")).over(all))
      .withColumn("tvd_num__", sum(abs(
        col("n_ref").cast(dec) * col("nc__") -
          col("n_cur").cast(dec) * lit(nRef))).over(all))
      .select(col("bin"), col("hi_units"), col("n_ref"), col("n_cur"),
        ExactRound.ratioScaled(col("n_ref"), lit(nRef), 6)
          .as("share_ref_e6"),
        ExactRound.ratioScaled(col("n_cur"), col("nc__"), 6)
          .as("share_cur_e6"),
        ExactRound.ratioScaledBig(col("tvd_num__"),
          col("nc__").cast(dec) * lit(2L * nRef), 6).as("tvd_e6"))
  }

  /** Categorical distribution drift — [[binDrift]]'s counterpart for
    * label-shaped columns (language mix, event-type mix, source mix):
    * per-category reference/current counts, exact e6 shares, and the
    * corpus-level exact TVD repeated per row. Categories absent from
    * one side count 0 there (their share gap is real drift).
    *
    * Unlike [[binDrift]] the category space is unbounded (domains,
    * langs), so the totals and the TVD numerator are computed as
    * 1-row aggregates broadcast back — NEVER a window over all
    * categories (which would be a single task over a possibly-huge
    * category list). */
  def categoryDrift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rc = ref.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val cc = cur.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val j = graft.Caches.register(rc.join(cc, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .persist())
    val totals = j.agg(sum(col("n_ref")).cast("long").as("nr__"),
      sum(col("n_cur")).cast("long").as("nc__"))
    val withTot = j.crossJoin(broadcast(totals))
    val tvd = withTot.agg(sum(abs(
      col("n_ref").cast(dec) * col("nc__") -
        col("n_cur").cast(dec) * col("nr__"))).as("tvd_num__"))
    withTot.crossJoin(broadcast(tvd))
      .select(col("category"), col("n_ref"), col("n_cur"),
        ExactRound.ratioScaled(col("n_ref"), col("nr__"), 6)
          .as("share_ref_e6"),
        ExactRound.ratioScaled(col("n_cur"), col("nc__"), 6)
          .as("share_cur_e6"),
        ExactRound.ratioScaledBig(col("tvd_num__"),
          col("nr__").cast(dec) * col("nc__") * lit(2L), 6)
          .as("tvd_e6"))
  }

  /** Pairwise LEXICAL DIVERGENCE matrix — exact total-variation
    * distance between every pair of sources' unigram distributions:
    * the "which slices are redundant / which add genuinely different
    * text?" input to mixture design. TV needs every word either side
    * emits, but materializing the union per pair is wasteful at a
    * billion-word vocabulary; the identity
    *
    *   Σ_w |c_a·C_b − c_b·C_a|
    *     = Σ_{w∈both} |c_a·C_b − c_b·C_a|
    *       + (C_a − S_a)·C_b + (C_b − S_b)·C_a
    *
    * (S = each side's token mass over the SHARED vocabulary) turns it
    * into an INNER join on word plus per-source totals — words unique
    * to one side never shuffle twice. tv_e6 = num / (2·C_a·C_b),
    * exact e6 (products ≤ 2·C² run in DECIMAL(38,0)); disjoint
    * vocabularies give exactly 1e6 via the no-shared-rows left-join
    * fallback.
    *
    * Shape at scale: one token shuffle to (source, word) counts, the
    * self-join keyed on word (≤ |sources|² rows per word — hundreds,
    * not corpus-sized), per-pair map-side-combinable aggregate; the
    * |sources|² pair frame and totals are broadcast. */
  def lexicalTvMatrix(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val wc = df.select(col(sourceCol).as("src__"),
        explode(graft.functions.TextFns.words(col(textCol))).as("w"))
      .groupBy(col("src__"), col("w")).agg(count(lit(1)).as("c__"))
    val tot = wc.groupBy(col("src__"))
      .agg(sum(col("c__")).as("ct__"), count(lit(1)).as("v__"))
    val wt = wc.join(broadcast(tot), "src__")
    val a = wt.select(col("src__").as("source_a"), col("w"),
      col("c__").as("ca__"), col("ct__").as("cta__"))
    val b = wt.select(col("src__").as("source_b"), col("w"),
      col("c__").as("cb__"), col("ct__").as("ctb__"))
    val shared = a.join(b, Seq("w"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_vocab"),
        sum(col("ca__")).as("sa__"), sum(col("cb__")).as("sb__"),
        sum(abs(col("ca__").cast(dec) * col("ctb__") -
          col("cb__").cast(dec) * col("cta__"))).as("cross__"))
    val pairs = broadcast(tot.select(col("src__").as("source_a"),
        col("ct__").as("cta__"), col("v__").as("va__")))
      .crossJoin(broadcast(tot.select(col("src__").as("source_b"),
        col("ct__").as("ctb__"), col("v__").as("vb__"))))
      .filter(col("source_a") < col("source_b"))
    pairs.join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("va__").as("vocab_a"), col("vb__").as("vocab_b"),
        coalesce(col("shared_vocab"), lit(0L)).as("shared_vocab"),
        ExactRound.ratioScaledBig(
          coalesce(col("cross__"), lit(0L).cast(dec)) +
            (col("cta__") - coalesce(col("sa__"), lit(0L))).cast(dec) *
              col("ctb__") +
            (col("ctb__") - coalesce(col("sb__"), lit(0L))).cast(dec) *
              col("cta__"),
          col("cta__").cast(dec) * col("ctb__") * lit(2L), 6)
          .as("tv_e6"))
  }

  /** The DuckDB mirror of [[lexicalTvMatrix]]. */
  def lexicalTvMatrixSql(table: String, source: String,
      wordsExpr: String): String =
    s"""WITH t AS (SELECT $source AS src, unnest($wordsExpr) AS w
       |  FROM $table),
       |wc AS (SELECT src, w, count(*) AS c FROM t GROUP BY 1, 2),
       |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS ct,
       |    count(*) AS v FROM wc GROUP BY 1),
       |wt AS (SELECT wc.src, wc.w, wc.c, tot.ct
       |  FROM wc JOIN tot USING (src)),
       |sh AS (SELECT a.src AS src_a, b.src AS src_b,
       |    count(*) AS shared_vocab,
       |    CAST(sum(a.c) AS BIGINT) AS sa,
       |    CAST(sum(b.c) AS BIGINT) AS sb,
       |    sum(abs(CAST(a.c AS HUGEINT) * b.ct
       |      - CAST(b.c AS HUGEINT) * a.ct)) AS crs
       |  FROM wt a JOIN wt b ON a.w = b.w AND a.src < b.src
       |  GROUP BY 1, 2),
       |p AS (SELECT a.src AS src_a, b.src AS src_b, a.ct AS cta,
       |    b.ct AS ctb, a.v AS va, b.v AS vb
       |  FROM tot a JOIN tot b ON a.src < b.src)
       |SELECT src_a AS source_a, src_b AS source_b,
       |  va AS vocab_a, vb AS vocab_b,
       |  coalesce(shared_vocab, 0) AS shared_vocab,
       |  ${ExactRound.ratioScaledSql(
           "coalesce(crs, 0) + CAST(cta - coalesce(sa, 0) AS HUGEINT) * ctb" +
             " + CAST(ctb - coalesce(sb, 0) AS HUGEINT) * cta",
           "CAST(cta AS HUGEINT) * ctb * 2", 6)} AS tv_e6
       |FROM p LEFT JOIN sh USING (src_a, src_b)""".stripMargin

  /** Two-sample KOLMOGOROV-SMIRNOV statistic, each group vs the REST
    * of the corpus: D = max over pooled values of |ECDF_g − ECDF_rest|
    * — the binning-free drift test next to [[binDrift]]'s decile TVD
    * ("does this source's length distribution differ from everyone
    * else's, and where?"). Exact rational throughout: at each
    * distinct value v the cross-multiplied gap
    * |cumA·nB − cumB·nA| is an integer, the max is taken over
    * integers, and D_e6 = maxgap·10⁶ div (nA·nB) — no float ECDFs to
    * disagree on. Output per group: (group, n_group, n_rest, d_e6,
    * at_units) where `at_units` is the SMALLEST value attaining the
    * max (deterministic tie-break; the units where the distributions
    * diverge most).
    *
    * Shape at scale: the sweep runs over the DISTINCT-VALUE tally,
    * never corpus rows (the q215 discipline): one (group, value)
    * count, one per-value total, a bounded-groups × distinct-values
    * grid (groups = sources: bounded), and per-group cumulative
    * windows over that tally. `valueUnits` must be integral units. */
  def ksGroupVsRest(df: DataFrame, groupCol: String,
      valueUnits: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val gv = graft.Caches.register(df
      .select(col(groupCol).as("g__"), valueUnits.cast("long").as("v__"))
      .filter(col("v__").isNotNull && col("g__").isNotNull)
      .groupBy(col("g__"), col("v__")).agg(count(lit(1)).as("c_gv__"))
      .persist())
    val perVal = gv.groupBy(col("v__")).agg(sum(col("c_gv__")).as("c_v__"))
    val perGrp = gv.groupBy(col("g__")).agg(sum(col("c_gv__")).as("na__"))
    val totN = gv.agg(sum(col("c_gv__")).as("n__"))
    val grid = broadcast(perGrp.crossJoin(broadcast(totN)))
      .crossJoin(perVal)
      .join(gv, Seq("g__", "v__"), "left")
      .select(col("g__"), col("v__"), col("na__"),
        (col("n__") - col("na__")).as("nb__"), col("c_v__"),
        coalesce(col("c_gv__"), lit(0L)).as("c_gv__"))
    val w = Window.partitionBy(col("g__")).orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gaps = grid
      .withColumn("cuma__", sum(col("c_gv__")).over(w))
      .withColumn("cumall__", sum(col("c_v__")).over(w))
      .select(col("g__"), col("v__"), col("na__"), col("nb__"),
        abs(col("cuma__").cast(dec) * col("nb__") -
          (col("cumall__") - col("cuma__")).cast(dec) * col("na__"))
          .as("gap__"))
    gaps.groupBy(col("g__"), col("na__"), col("nb__"))
      .agg(max(struct(col("gap__"), (-col("v__")).as("nv__")))
        .as("best__"))
      .select(col("g__").as(groupCol), col("na__").as("n_group"),
        col("nb__").as("n_rest"),
        ExactRound.ratioScaledBig(col("best__.gap__"),
          col("na__").cast(dec) * col("nb__"), 6).as("d_e6"),
        (-col("best__.nv__")).as("at_units"))
  }

  /** WASSERSTEIN-1 (earth-mover) distance per group vs the rest of
    * the corpus — [[ksGroupVsRest]]'s integral twin: where KS reports
    * the single worst ECDF gap, W1 integrates EVERY gap over the
    * value axis, `W1 = Σᵢ |F_A(vᵢ) − F_B(vᵢ)|·(vᵢ₊₁ − vᵢ)` on the
    * distinct-value grid — the binning-free "how much mass must move,
    * and how far" statistic (KS can't tell a small persistent shift
    * from a sharp local one; W1 can). Exact: cross-multiplied integer
    * ECDF gaps (the KS discipline), gap·Δv terms summed in
    * DECIMAL(38,0), one e2 ratio per group — `w1_units_e2` is the
    * distance in VALUE UNITS scaled by 100.
    *
    * Shape at scale: identical to [[ksGroupVsRest]] — distinct-value
    * tallies, a groups×values grid, per-group prefix-sum windows over
    * the bounded value grid; the extra lead() rides the same window
    * sort. */
  def wasserstein1GroupVsRest(df: DataFrame, groupCol: String,
      valueUnits: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val gv = graft.Caches.register(df
      .select(col(groupCol).as("g__"), valueUnits.cast("long").as("v__"))
      .filter(col("v__").isNotNull && col("g__").isNotNull)
      .groupBy(col("g__"), col("v__")).agg(count(lit(1)).as("c_gv__"))
      .persist())
    val perVal = gv.groupBy(col("v__")).agg(sum(col("c_gv__")).as("c_v__"))
    val perGrp = gv.groupBy(col("g__")).agg(sum(col("c_gv__")).as("na__"))
    val totN = gv.agg(sum(col("c_gv__")).as("n__"))
    val grid = broadcast(perGrp.crossJoin(broadcast(totN)))
      .crossJoin(perVal)
      .join(gv, Seq("g__", "v__"), "left")
      .select(col("g__"), col("v__"), col("na__"),
        (col("n__") - col("na__")).as("nb__"), col("c_v__"),
        coalesce(col("c_gv__"), lit(0L)).as("c_gv__"))
    val w = Window.partitionBy(col("g__")).orderBy(col("v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lw = Window.partitionBy(col("g__")).orderBy(col("v__"))
    val terms = grid
      .withColumn("cuma__", sum(col("c_gv__")).over(w))
      .withColumn("cumall__", sum(col("c_v__")).over(w))
      // the last grid value carries no interval (both ECDFs are 1
      // there anyway — its gap is identically 0)
      .withColumn("dv__",
        coalesce(lead(col("v__"), 1).over(lw) - col("v__"), lit(0L)))
      .select(col("g__"), col("na__"), col("nb__"),
        (abs(col("cuma__").cast(dec) * col("nb__") -
          (col("cumall__") - col("cuma__")).cast(dec) * col("na__")) *
          col("dv__")).cast(dec).as("t__"))
    terms.groupBy(col("g__"), col("na__"), col("nb__"))
      .agg(sum(col("t__")).as("s__"))
      .select(col("g__").as(groupCol), col("na__").as("n_group"),
        col("nb__").as("n_rest"),
        ExactRound.ratioScaledBig(col("s__"),
          col("na__").cast(dec) * col("nb__"), 2).as("w1_units_e2"))
  }

  /** TOP TOKEN MOVERS between two corpora — per token the add-1
    * smoothed relative-rate ratio
    * ((c_a+1)/(N_a+V)) / ((c_b+1)/(N_b+V)) as the exact e6 rational
    * (c_a+1)·(N_b+V) / ((c_b+1)·(N_a+V)): the "which words define
    * side A?" drill-down behind [[lexicalTvMatrix]]'s scalar distance
    * (the same keyword-extraction shape as log-odds-ratio with
    * informative Dirichlet priors — Monroe et al. 2008 — minus the
    * gate-hostile log). Emits the top `k` movers in EACH direction
    * ((score DESC|ASC, token ASC) — total order), tagged a_heavy /
    * b_heavy, with both raw counts.
    *
    * Shape at scale: two vocabulary-sized tallies, one full outer
    * join on token, a 1-row broadcast of (N_a, N_b, V), and two
    * TakeOrderedAndProject top-ks (per-partition heaps, no global
    * sort). */
  def tokenMovers(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    import graft.functions.{ExactRound, TextFns}
    def tally(df: DataFrame, out: String): DataFrame = df
      .select(explode(TextFns.words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(out))
    val ca = tally(a, "c_a")
    val cb = tally(b, "c_b")
    val joined = graft.Caches.register(ca
      .join(cb, Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .persist())
    val tot = joined.agg(sum(col("c_a")).cast("long").as("na__"),
      sum(col("c_b")).cast("long").as("nb__"),
      count(lit(1)).cast("long").as("v__"))
    val dec = "decimal(38,0)"
    val scored = graft.Caches.register(joined
      .crossJoin(broadcast(tot))
      .select(col("token"), col("c_a"), col("c_b"),
        ExactRound.ratioScaledBig(
          (col("c_a") + 1L).cast(dec) * (col("nb__") + col("v__")),
          (col("c_b") + 1L).cast(dec) * (col("na__") + col("v__")), 6)
          .as("score_e6"))
      .persist())
    val up = RankOps.topK(scored, k, col("score_e6"), col("token"))
      .withColumn("direction", lit("a_heavy"))
    val down = RankOps.topK(scored, k, col("score_e6"), col("token"),
        ascending = true)
      .withColumn("direction", lit("b_heavy"))
    up.union(down)
      .select(col("direction"), col("token"), col("c_a"), col("c_b"),
        col("score_e6"))
  }
}
