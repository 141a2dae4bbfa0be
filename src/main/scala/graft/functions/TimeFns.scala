package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit, pmod}

/** Epoch-time bucketing arithmetic shared by every query that carves
  * the long-nanos `ts` column (see `graft.Tables.normalizeTs`) into
  * seconds/hours/days.
  */
object TimeFns {

  /** Floor division on an integral column — matches DuckDB's `//`
    * (which floors) where Spark's `div` truncates toward zero. The two
    * agree on every non-negative dividend, i.e. on every corpus this
    * repo has seen, but a regenerated corpus drawing a pre-1970
    * timestamp would silently land truncation-bucketed rows one bucket
    * high while the oracle floors them low — the same class of silent
    * engine-pair divergence as the r7 DuckDB-version reds. pmod is
    * non-negative by definition, so `(c − pmod(c, d)) div d` is the
    * exact floored quotient in pure long arithmetic (no double
    * round-trip), and both terms stay inside whole-stage codegen.
    * Requires d > 0 (all bucket widths here are literals).
    */
  def floorDiv(c: Column, d: Long): Column = {
    require(d > 0, s"floorDiv needs a positive divisor, got $d")
    call_function("div", c - pmod(c, lit(d)), lit(d))
  }
}
