package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact half-up rounding of non-negative integer rationals — the
  * tie-proof replacement for `round(num/den, d)` on gate-hashed
  * columns.
  *
  * `round(double)` at a decimally-representable tie is engine-trap
  * territory: 102/320 = 0.31875 stores as 0.31874999…78, and whether an
  * engine rounds the shortest decimal repr ("0.31875" → 0.3188,
  * Spark/older DuckDB) or the exact binary value (→ 0.3187, newer
  * DuckDB) flips the 4th decimal — a one-row cross-engine hash flap
  * (round-7 q71, doc 97). Any `int/int` fraction can land exactly on a
  * `.5` boundary by construction, so every gated ratio goes through
  * here instead.
  *
  * The whole computation stays in 64-bit integer arithmetic:
  *
  *   round(num/den, d) = floor((num·2·10^d + den) / (2·den)) / 10^d
  *
  * `div` (IntegralDivide) keeps the quotient a long — no double creeps
  * in before the final exactly-representable division by 10^d, so both
  * engines compute the identical bit pattern. Requires num ≥ 0,
  * den ≥ 0, and num·2·10^d + den within long range (num < ~4.6e14 at
  * d=4 — far above any count this library rounds). den = 0 or NULL
  * yields 0.0 (the ratio conventions of the coverage/overlap
  * reports); num NULL with den > 0 yields NULL.
  */
object ExactRound {

  /** `round(num/den, d)` as an exact integer computation; see object
    * doc. `num`/`den` must be integral columns (cast yourself if not).
    *
    * NULL CONTRACT — asymmetric, unlike `round(coalesce(x, 0.0), 4)`:
    * den NULL or 0 → 0.0, but num NULL with den > 0 → NULL. A nullable
    * numerator from a left join must be `coalesce`d by the CALLER if
    * 0.0 is the intended reading (Decontaminate does; q71's report
    * does). [[ratioSql]] mirrors the same contract.
    *
    * The scaled dividend runs in DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB): `num·2·10^d` would overflow a long once num reaches
    * ~4.6e14, and composite rationals (q18's quality score is a
    * three-factor product ≈ 200·len·nw) cross that on multi-megabyte
    * documents — ANSI mode would throw, non-ANSI would silently wrap.
    * 128-bit headroom (1e38) covers any product of realistic counts;
    * `div` (IntegralDivide) on decimals still returns an exact long. */
  def ratio(num: Column, den: Column, d: Int = 4): Column = {
    val p = math.pow(10, d).toLong
    val n = num.cast("decimal(38,0)")
    val dn = den.cast("decimal(38,0)")
    val q = call_function("div", n * lit(2L * p) + dn, dn * lit(2L))
    when(den.cast("long") > 0, q.cast("double") / lit(p.toDouble))
      .otherwise(lit(0.0))
  }

  /** [[ratio]] WITHOUT the final divide-by-10^d: the rounded ratio as
    * the scaled LONG `round(num/den · 10^d)` — for gate-hashed columns
    * where even an exactly-representable double is one more surface a
    * comparing engine can render differently. The integer quotient
    * carries identical information (`ratio = ratioScaled / 10^d`
    * exactly) with zero floating point anywhere in the lineage. Same
    * NULL contract as [[ratio]]. */
  def ratioScaled(num: Column, den: Column, d: Int = 4): Column = {
    val p = math.pow(10, d).toLong
    val n = num.cast("decimal(38,0)")
    val dn = den.cast("decimal(38,0)")
    val q = call_function("div", n * lit(2L * p) + dn, dn * lit(2L))
    when(den.cast("long") > 0, q.cast("long")).otherwise(lit(0L))
  }

  /** [[ratioScaled]] for WIDE denominators: the positivity guard
    * compares the DECIMAL(38,0) form directly instead of long-casting
    * it — a denominator that is itself a product of longs (bin-count
    * cross products, unigram-count products) can exceed long range at
    * extreme scale, where the long cast would null out and silently
    * zero the ratio. Mirror with [[ratioScaledSql]] (its guard is
    * already HUGEINT-safe). */
  def ratioScaledBig(num: Column, den: Column, d: Int = 4): Column = {
    val p = math.pow(10, d).toLong
    val n = num.cast("decimal(38,0)")
    val dn = den.cast("decimal(38,0)")
    val q = call_function("div", n * lit(2L * p) + dn, dn * lit(2L))
    when(dn > lit(0L).cast("decimal(38,0)"), q.cast("long"))
      .otherwise(lit(0L))
  }

  /** [[ratioScaledBig]] for SIGNED numerators (denominator still
    * required positive): integer `div` truncates toward zero, so the
    * rounding identity is applied to |num| and the sign re-attached —
    * round-half-away-from-zero, matching [[ratioScaledSignedSql]]
    * exactly. */
  def ratioScaledSigned(num: Column, den: Column, d: Int = 4): Column = {
    val p = math.pow(10, d).toLong
    val n = num.cast("decimal(38,0)")
    val dn = den.cast("decimal(38,0)")
    val q = call_function("div", abs(n) * lit(2L * p) + dn, dn * lit(2L))
      .cast("long")
    when(dn > lit(0L).cast("decimal(38,0)"),
      when(n < 0, -q).otherwise(q)).otherwise(lit(0L))
  }

  /** The DuckDB mirror of [[ratioScaledSigned]]. */
  def ratioScaledSignedSql(num: String, den: String, d: Int = 4): String = {
    val p = math.pow(10, d).toLong
    s"(CASE WHEN ($den) > 0 THEN CAST((CASE WHEN ($num) < 0 THEN -1 " +
      s"ELSE 1 END) * ((abs(CAST(($num) AS HUGEINT)) * ${2 * p} " +
      s"+ ($den)) // (2 * CAST(($den) AS HUGEINT))) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END)"
  }

  /** The DuckDB mirror of [[ratioScaled]] — interpolate into oracle
    * SQL. Pure HUGEINT arithmetic, final value cast to BIGINT. */
  def ratioScaledSql(num: String, den: String, d: Int = 4): String = {
    val p = math.pow(10, d).toLong
    s"(CASE WHEN ($den) > 0 THEN CAST((CAST(($num) AS HUGEINT) * ${2 * p} " +
      s"+ ($den)) // (2 * CAST(($den) AS HUGEINT)) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END)"
  }

  /** The DuckDB mirror of [[ratio]] — interpolate into oracle SQL.
    * `//` is DuckDB's integer division; HUGEINT operands give the same
    * 128-bit headroom as the Spark side's DECIMAL(38,0). */
  def ratioSql(num: String, den: String, d: Int = 4): String = {
    val p = math.pow(10, d).toLong
    s"(CASE WHEN ($den) > 0 THEN CAST((CAST(($num) AS HUGEINT) * ${2 * p} " +
      s"+ ($den)) // (2 * CAST(($den) AS HUGEINT)) AS DOUBLE) / $p.0 " +
      "ELSE 0.0 END)"
  }
}
