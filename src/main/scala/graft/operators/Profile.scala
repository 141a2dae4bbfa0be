package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operators — the "describe this table" surface a
  * warehouse engine ships (reference `checkdb.py`'s row-accounting
  * loop is the spirit): per-column stats and exact equi-width
  * histograms, with every emitted value an integer or string so the
  * profile is engine-exact (the q71 gate discipline).
  */
object Profile {

  /** One row per requested column: (col_name, n_rows, n_null,
    * n_distinct, min_s, max_s) — min/max rendered as strings so
    * integer and string columns share one schema (callers pass
    * integral/string columns; float columns should be profiled via
    * [[histogram]] on a scaled-integer form instead, never through
    * cross-engine float-to-string rendering).
    *
    * All columns' stats are computed in a SINGLE aggregate job — one
    * scan of the table regardless of how many columns are profiled —
    * then the one wide row unpivots to the per-column schema. The N
    * count_distinct aggregates plan as one Expand (input rows ×(N+1)
    * before partial aggregation): CPU comparable to N scans, but the
    * table is READ once, which is what dominates profiling a 100 TB
    * table. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = count(lit(1)).as("n_rows__") +: cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null__$c"),
      count_distinct(col(c)).as(s"n_distinct__$c"),
      min(col(c)).cast("string").as(s"min__$c"),
      max(col(c)).cast("string").as(s"max__$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c => struct(
      lit(c).as("col_name"), col("n_rows__").as("n_rows"),
      col(s"n_null__$c").as("n_null"),
      col(s"n_distinct__$c").as("n_distinct"),
      col(s"min__$c").as("min_s"), col(s"max__$c").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("r__")).select(col("r__.*"))
  }

  /** Exact equi-width histogram of an integral column: bucket width =
    * (max−min) div nBuckets + 1 (so every value lands in
    * [0, nBuckets)), bounds data-dependent but integer-derived. Output
    * one row per NON-EMPTY bucket: (bucket, lo, hi, n_rows) with
    * lo/hi the bucket's inclusive value range. NULLs are excluded
    * (profile them via [[columns]]). The bounds aggregate broadcasts
    * back — two passes over the column, no sort, no corpus-wide
    * window. */
  def histogram(df: DataFrame, valueCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val vals = df.select(col(valueCol).cast("long").as("v__"))
      .filter(col("v__").isNotNull)
    val bounds = vals.agg(min(col("v__")).as("mn__"), max(col("v__")).as("mx__"))
    val width = call_function("div",
      col("mx__") - col("mn__"), lit(nBuckets.toLong)) + 1L
    vals.crossJoin(broadcast(bounds))
      .withColumn("w__", width)
      .withColumn("bucket",
        call_function("div", col("v__") - col("mn__"), col("w__")))
      .groupBy(col("bucket"), col("mn__"), col("w__"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bucket"),
        (col("mn__") + col("bucket") * col("w__")).as("lo"),
        (col("mn__") + (col("bucket") + 1L) * col("w__") - 1L).as("hi"),
        col("n_rows"))
  }

  /** Shuffle-key skew report — the sizing query run BEFORE a big
    * groupBy/join on `keyCol`: the topK hottest keys with their row
    * counts, the key-space size, and each hot key's share of all rows
    * (exact scaled ratio). A top-1 share in the percents says "salt
    * this key" ([[graft.operators.FuzzyJoin]]'s derivation automates
    * the same decision for its block key); a flat report says plain
    * hash partitioning is fine.
    *
    * Shape: one map-side-combinable count aggregate, a TakeOrdered
    * top-k (every task forwards its own k — no global sort), one
    * broadcast totals join. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = graft.Caches.register(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows_key")).persist())
    val totals = counts.agg(sum(col("n_rows_key")).as("n_total"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("n_rows_key").desc, col(keyCol).asc).limit(topK)
      .crossJoin(broadcast(totals))
      .select(col(keyCol), col("n_rows_key"), col("n_keys"), col("n_total"),
        graft.functions.ExactRound.ratioScaled(col("n_rows_key"),
          col("n_total"), 4).as("share_e4"))
  }

  /** Functional-dependency check — for each candidate (determinant →
    * dependent) pair: does every determinant value map to exactly one
    * dependent value? The schema-discovery / data-quality probe
    * behind "is this column a key?", "did the denormalization break?"
    * (the reference trusts its scrape's symbol→sector mapping
    * blindly; this is the check it never runs). FD holds iff
    * |distinct (det, dep)| = |distinct det|; the violation count is
    * the number of EXTRA (det, dep) mappings beyond one per
    * determinant. Rows where either side is NULL are excluded (a
    * NULL determinant can't determine; a NULL dependent is a missing
    * mapping, not a second one) — both engines mirror that contract
    * explicitly.
    *
    * Shape at scale: ALL pairs reduce in ONE aggregate over one scan
    * (the [[columns]] Expand discipline) — each count_distinct adds
    * an Expand lane, never a pass; the wide row then unpivots. */
  def functionalDeps(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate FD")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val bothNn = col(a).isNotNull && col(b).isNotNull
      Seq(
        count_distinct(when(bothNn, col(a))).as(s"nd__$i"),
        count_distinct(when(bothNn, struct(col(a), col(b))))
          .as(s"np__$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => struct(
      lit(a).as("determinant"), lit(b).as("dependent"),
      col(s"nd__$i").as("n_det"), col(s"np__$i").as("n_pairs"),
      (col(s"np__$i") - col(s"nd__$i")).as("n_violations"),
      (col(s"np__$i") === col(s"nd__$i")).as("fd_holds"))
    }
    wide.select(explode(array(rows: _*)).as("r__")).select(col("r__.*"))
  }

  /** Referential-integrity audit — for each declared (child, parent)
    * key relation: child row count, orphan count (child keys with no
    * parent row; NULL child keys counted separately — they are
    * "unlinked", not "dangling"), and the exact e6 orphan share. The
    * constraint check a warehouse runs after every load (the
    * reference's scrape joins symbol→sector blindly;
    * `checkdb.py` counts rows but never checks the links).
    *
    * Shape at scale: one left-anti-style aggregate per relation —
    * child groups by key (map-side combinable), parent keys join as
    * the smaller side (broadcast when they fit). */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      relation: String): DataFrame = {
    val keys = child
      .groupBy(col(childKey).as("k__"))
      .agg(count(lit(1)).as("n__"))
    val matched = keys.join(
      parent.select(col(parentKey).as("k__")).distinct(),
      Seq("k__"), "left_semi")
      .agg(coalesce(sum(col("n__")), lit(0L)).as("n_linked"))
    val totals = child.agg(
      count(lit(1)).as("n_child_rows"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    totals.crossJoin(matched)
      .select(lit(relation).as("relation"), col("n_child_rows"),
        col("n_null_keys"),
        (col("n_child_rows") - col("n_null_keys") - col("n_linked"))
          .as("n_orphans"),
        graft.functions.ExactRound.ratioScaled(
          col("n_child_rows") - col("n_null_keys") - col("n_linked"),
          col("n_child_rows"), 6).as("orphan_share_e6"))
  }

  /** Order-independent per-column content checksums — one row per
    * column: non-null count and a set-shaped digest (exact decimal
    * sums of the 64-bit md5-prefix hash of each value's string
    * rendering, split into hi/lo 32-bit lanes and reduced mod 2⁶²):
    * the cheap cross-engine "is this the same data?" handshake after
    * a migration or repartition, where any row-order-sensitive hash
    * would be useless. Collisions are checksum-grade, not
    * cryptographic. Restricted by contract to integral/string
    * columns (the [[columns]] min/max rule: float-to-string
    * rendering is not engine-portable). NULLs contribute nothing.
    *
    * Shape at scale: ONE aggregate over one scan, all columns as
    * parallel lanes. */
  def columnChecksums(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum at least one column")
    val dec = "decimal(38,0)"
    val mod = 1L << 62
    def h(c: String) =
      graft.expressions.Md5Prefix64(col(c).cast("string"))
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"n__$c"),
      sum(when(col(c).isNotNull,
        shiftrightunsigned(h(c), 32)).cast(dec)).as(s"hi__$c"),
      sum(when(col(c).isNotNull,
        h(c).bitwiseAND(lit(0xffffffffL))).cast(dec)).as(s"lo__$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val zero = lit(0L).cast(dec)
    val rows = cols.map { c => struct(
      lit(c).as("col_name"), col(s"n__$c").as("n_values"),
      pmod(coalesce(col(s"hi__$c"), zero), lit(mod).cast(dec))
        .cast("long").as("checksum_hi"),
      pmod(coalesce(col(s"lo__$c"), zero), lit(mod).cast(dec))
        .cast("long").as("checksum_lo"))
    }
    wide.select(explode(array(rows: _*)).as("r__")).select(col("r__.*"))
  }

  /** MERKLE-STYLE drill-down of [[columnChecksums]]: the same
    * order-independent per-column lanes, but per KEY-HASH BUCKET — the
    * cheap "WHERE do two table versions differ?" localizer: compare
    * two runs bucket by bucket; only buckets whose checksums diverge
    * need row-level diffing, so a one-row discrepancy in a 100 TB
    * table is narrowed to 1/nBuckets of it for the price of two scans
    * and a 2·nBuckets-row compare. The bucket key is the low 32 bits
    * of the row key's md5-prefix64 mod nBuckets (non-negative in both
    * engines — no signed-mod mirroring).
    *
    * Shape at scale: one scan, one map-side-combinable aggregate over
    * nBuckets groups. */
  def bucketChecksums(df: DataFrame, keyCol: String, cols: Seq[String],
      nBuckets: Int = 64): DataFrame = {
    require(cols.nonEmpty && nBuckets >= 1, "need columns and buckets")
    val dec = "decimal(38,0)"
    val mod = 1L << 62
    def h(c: String) =
      graft.expressions.Md5Prefix64(col(c).cast("string"))
    val bucket = pmod(
      graft.expressions.Md5Prefix64(col(keyCol).cast("string"))
        .bitwiseAND(lit(0xffffffffL)),
      lit(nBuckets.toLong))
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"n__$c"),
      sum(when(col(c).isNotNull,
        shiftrightunsigned(h(c), 32)).cast(dec)).as(s"hi__$c"),
      sum(when(col(c).isNotNull,
        h(c).bitwiseAND(lit(0xffffffffL))).cast(dec)).as(s"lo__$c"))
    }
    val wide = df.groupBy(bucket.as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    val zero = lit(0L).cast(dec)
    val rows = cols.map { c => struct(
      lit(c).as("col_name"), col(s"n__$c").as("n_values"),
      pmod(coalesce(col(s"hi__$c"), zero), lit(mod).cast(dec))
        .cast("long").as("checksum_hi"),
      pmod(coalesce(col(s"lo__$c"), zero), lit(mod).cast(dec))
        .cast("long").as("checksum_lo"))
    }
    wide.select(col("bucket"), explode(array(rows: _*)).as("r__"))
      .select(col("bucket"), col("r__.*"))
  }

  /** Join-fanout estimate — the exact size a key-equi-join WOULD
    * produce (Σ over matched keys of n_left·n_right) plus the top
    * contributing keys: the pre-flight check before a join whose
    * key multiplicity is uncertain (the planner's cardinality
    * estimate, made exact — and the first place a "why is this join
    * 100× the input" incident looks). Output: the `topK` heaviest
    * keys, each carrying the corpus totals (est_total_rows,
    * n_matched_keys) alongside its own contribution.
    *
    * Shape at scale: two map-side-combinable per-key counts, one
    * equi-join of the count tables (far smaller than the data), a
    * TakeOrdered top-k, and a 1-row broadcast total. */
  def joinFanout(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val dec = "decimal(38,0)"
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    // SATURATING long surface (r11 advice): the non-ANSI decimal->long
    // cast yields NULL on overflow, which would under-report exactly
    // the exploding-key incident this operator exists to catch — so
    // the decimal products/sums clamp at Long.MaxValue instead. Exact
    // whenever the estimate fits a long; a saturated 2^63-1 still
    // screams "do not run this join".
    val longMax = lit(Long.MaxValue).cast(dec)
    val j = graft.Caches.register(lc.join(rc, "key")
      .withColumn("n_out__", col("n_left").cast(dec) * col("n_right"))
      .withColumn("n_out", least(col("n_out__"), longMax).cast("long"))
      .persist())
    val totals = j.agg(
      least(coalesce(sum(col("n_out__")), lit(0L).cast(dec)), longMax)
        .cast("long").as("est_total_rows"),
      count(lit(1)).as("n_matched_keys"))
    // top-k orders on the UNSATURATED decimal product (two saturated
    // keys would tie at 2^63-1; the true fanout order still ranks them)
    j.orderBy(col("n_out__").desc, col("key").asc).limit(topK)
      .drop("n_out__")
      .crossJoin(broadcast(totals))
  }

  /** Source-concentration profile — Herfindahl–Hirschman index plus
    * CR1/CR4 concentration ratios of a weight (tokens, chars, rows)
    * across a grouping column: the one-row "is this corpus dominated
    * by a handful of sources?" diagnostic a mixture designer checks
    * before trusting per-source statistics. HHI = Σ share_i² ∈
    * (1/n, 1]; every emitted number is an exact scaled integer
    * (HHI through the decimal Σw²/total² rational — no doubles).
    *
    * Shape at scale: one map-side-combinable groupBy, one aggregate
    * over the group table, one top-4 `TakeOrderedAndProject`; the
    * group table is |sources|-sized — tiny by definition. */
  def concentration(df: DataFrame, groupCol: String,
      weight: org.apache.spark.sql.Column): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = graft.Caches.register(df
      .groupBy(col(groupCol).as("g__"))
      .agg(sum(weight.cast("long")).as("w__"))
      .filter(col("w__") > 0)
      .persist())
    val totals = counts.agg(count(lit(1)).as("n_groups"),
      sum(col("w__")).cast("long").as("total_units"),
      sum(col("w__").cast(dec) * col("w__")).as("sumsq__"))
    val top = counts.orderBy(col("w__").desc, col("g__").asc).limit(4)
      .agg(coalesce(max(col("w__")), lit(0L)).as("top1__"),
        coalesce(sum(col("w__")), lit(0L)).cast("long").as("top4__"))
    totals.crossJoin(broadcast(top))
      .select(col("n_groups"), col("total_units"),
        graft.functions.ExactRound.ratioScaledBig(col("sumsq__"),
          col("total_units").cast(dec) * col("total_units"), 6)
          .as("hhi_e6"),
        graft.functions.ExactRound.ratioScaled(col("top1__"),
          col("total_units"), 6).as("cr1_e6"),
        graft.functions.ExactRound.ratioScaled(col("top4__"),
          col("total_units"), 6).as("cr4_e6"))
  }

  /** First-significant-digit profile (the Benford's-law screen) —
    * digit counts and exact e6 shares of a positive integral metric:
    * the cheap synthetic-data / fabrication detector (organic
    * heavy-tailed quantities lean toward low leading digits;
    * uniformly-generated ones don't — the judgment stays with the
    * reader, the profile is the evidence). The digit comes from the
    * BIGINT's decimal string rendering — identical across engines by
    * the [[columnChecksums]] rendering contract. Non-positive and
    * NULL values are excluded (no leading digit).
    *
    * Shape at scale: one map-side-combinable count over <= 9 digit
    * groups; the share window runs over those 9 rows. */
  def firstDigitProfile(df: DataFrame,
      valueUnits: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(valueUnits.cast("long").as("v__"))
      .filter(col("v__") > 0L)
      .select(substring(col("v__").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    counts.withColumn("n_total", sum(col("n")).over(all))
      .select(col("digit"), col("n"), col("n_total"),
        graft.functions.ExactRound.ratioScaled(col("n"),
          col("n_total"), 6).as("share_e6"))
  }

  /** Multi-granularity rollup summary — per-dimension-prefix counts
    * and exact sums at every rollup level ((d1, d2), (d1), ()), with
    * one `g_<dim>` indicator column per dimension (1 = rolled up at
    * that level) so subtotal rows are distinguishable from genuine
    * NULL dimension values — the OLAP subtotal surface
    * (`GROUP BY ROLLUP`) the reference's per-sector + overall score
    * tables hand-assemble from separate passes.
    *
    * Shape at scale: Spark plans rollup as ONE Expand (+1 lane per
    * level) over a single scan feeding a map-side-combinable
    * aggregate — the same discipline as [[columns]]; the sum is an
    * exact decimal accumulator surfaced as a long. */
  def rollupStats(df: DataFrame, dims: Seq[String],
      valueUnits: org.apache.spark.sql.Column): DataFrame = {
    require(dims.nonEmpty, "need at least one rollup dimension")
    val dec = "decimal(38,0)"
    // grouping() is only legal INSIDE the rollup aggregate (Catalyst
    // resolves it against the GroupingSets node), so the indicator
    // columns are aggregation expressions, not a later projection
    val aggs =
      dims.map(d => grouping(col(d)).cast("long").as(s"g_$d")) ++
        Seq(count(lit(1)).as("n_rows"),
          sum(col("u__").cast(dec)).cast("long").as("sum_units"))
    df.select(dims.map(col) :+ valueUnits.cast("long").as("u__"): _*)
      .rollup(dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(dims.map(col) ++
        dims.map(d => col(s"g_$d")) ++
        Seq(col("n_rows"), col("sum_units")): _*)
  }

  /** CUBE variant of [[rollupStats]] — all 2^|dims| grouping-set
    * combinations (the rollup's prefix levels PLUS the cross
    * marginals, e.g. per-lang-across-sources), one Expand lane per
    * set, same exact decimal sums and grouping indicators. */
  def cubeStats(df: DataFrame, dims: Seq[String],
      valueUnits: org.apache.spark.sql.Column): DataFrame = {
    require(dims.nonEmpty, "need at least one cube dimension")
    val dec = "decimal(38,0)"
    val aggs =
      dims.map(d => grouping(col(d)).cast("long").as(s"g_$d")) ++
        Seq(count(lit(1)).as("n_rows"),
          sum(col("u__").cast(dec)).cast("long").as("sum_units"))
    df.select(dims.map(col) :+ valueUnits.cast("long").as("u__"): _*)
      .cube(dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(dims.map(col) ++
        dims.map(d => col(s"g_$d")) ++
        Seq(col("n_rows"), col("sum_units")): _*)
  }

  /** Benford's-law e6 expected shares for first digits 1-9 —
    * round(log10(1 + 1/d) · 1e6), the published constants pinned as
    * literals so no libm call sits in any gate lineage (the q170 DCG
    * weight-table discipline). Shared with the oracle SQL via
    * [[benfordTableSql]]. */
  val benfordE6: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** The DuckDB VALUES-list mirror of [[benfordE6]]. */
  def benfordTableSql: String = benfordE6
    .map { case (d, e) => s"($d, $e)" }.mkString("(VALUES ", ", ", ")")

  /** Benford first-digit QA card — the classic fabricated-data /
    * broken-ingest tripwire: the first significant digit of a
    * naturally-spread positive metric follows log10(1+1/d); a flat or
    * spiked digit histogram means truncation, defaults, or synthetic
    * values leaked into the column. Per digit 1-9: observed count,
    * exact e6 observed share, the pinned expected share, and the
    * absolute gap — all integers, no libm.
    *
    * `valueUnits` must be a positive integer column (scale decimals to
    * units first, the q183 cents pattern); zero/negative/null rows are
    * excluded and reported against the positive-row total. The first
    * digit comes from a 19-arm integer-division CASE ladder (covers
    * the full long range), identical in the oracle — no string
    * formatting, whose float rendering differs across engines.
    *
    * Shape at scale: one codegen'd projection + one 9-group map-side
    * combinable aggregate; the digit table joins the 9-row expectation
    * literal. */
  def benfordCard(df: DataFrame, valueUnits: org.apache.spark.sql.Column)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = valueUnits.cast("long")
    val digits = df.select(v.as("v__"))
      .filter(col("v__").isNotNull && col("v__") > 0L)
      .select(firstDigitLadder(col("v__")).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expect = benfordE6.toDF("digit", "benford_e6")
    val total = digits.agg(sum(col("n")).as("total__"))
    expect.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit").cast("long").as("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        graft.functions.ExactRound.ratioScaled(
          coalesce(col("n"), lit(0L)), col("total__"), 6)
          .as("share_e6"),
        col("benford_e6"))
      .withColumn("gap_e6", abs(col("share_e6") - col("benford_e6")))
  }

  /** The 19-arm integer-division ladder extracting the first
    * significant digit of a positive long — mirrored verbatim in
    * oracle SQL by [[firstDigitLadderSql]]. */
  private[operators] def firstDigitLadder(
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to 18).foldLeft(v) { (acc, p) =>
      val pow = math.pow(10, p).toLong
      when(v >= pow, call_function("div", v, lit(pow))).otherwise(acc)
    }

  /** DuckDB mirror of [[firstDigitLadder]] over SQL expression `v`. */
  def firstDigitLadderSql(v: String): String =
    (18 to 1 by -1).map { p =>
      val pow = math.pow(10, p).toLong
      s"WHEN ($v) >= $pow THEN ($v) // $pow"
    }.mkString("(CASE ", " ", s" ELSE ($v) END)")
}
