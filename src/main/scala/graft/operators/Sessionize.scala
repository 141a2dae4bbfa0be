package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics: gap-based sessionization and tumbling
  * window aggregation. The batch twins of the Structured Streaming
  * operators in `graft.streaming` — same semantics, expressible against
  * the DuckDB oracle.
  */
object Sessionize {

  /** Gap-based sessionization: a new session starts when the time since
    * the user's previous event exceeds `gapSeconds`. One shuffle
    * (partitionBy user) + in-partition sort; the running-sum session id
    * is the classic lag→flag→cumsum pattern.
    * `tsSeconds` must be a numeric (epoch-seconds or -micros) column so
    * ordering and gap arithmetic are engine-agnostic.
    */
  def sessions(df: DataFrame, userCol: String, tsSeconds: Column,
      gapSeconds: Long, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(tsSeconds.asc, tieBreak.asc)
    val prev = lag(tsSeconds, 1).over(w)
    val isNew = when(prev.isNull || tsSeconds - prev > gapSeconds, 1).otherwise(0)
    val sess = sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("session_seq", sess)
  }

  /** Per-session rollup: event count, span, value sum. */
  def sessionStats(df: DataFrame, userCol: String, tsSeconds: Column,
      gapSeconds: Long, tieBreak: Column, valueCol: String): DataFrame =
    sessions(df, userCol, tsSeconds, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(tsSeconds) - min(tsSeconds)).as("span"),
        round(sum(col(valueCol)), 2).as("value_sum"))

  /** Tumbling-window aggregation (batch form of a streaming windowed agg):
    * bucket = floor(ts / windowSeconds) * windowSeconds. */
  def tumbling(df: DataFrame, tsSeconds: Column, windowSeconds: Long,
      keyCols: Seq[Column], valueCol: Column): DataFrame = {
    val bucket = (floor(tsSeconds / windowSeconds) * windowSeconds).as("window_start")
    df.groupBy(bucket +: keyCols: _*)
      .agg(count(lit(1)).as("n_events"), round(sum(valueCol), 2).as("value_sum"))
  }

  /** Top event-type PATHS per session — the sequence-pattern summary
    * behind "what do users actually do in one sitting?" (and the
    * session-level counterpart of
    * [[EventAnalytics.transitionMatrix]]'s single steps). Each
    * session's path is its event types joined in (ts, tie) order;
    * paths count across sessions; top `topN` by (count desc, path
    * asc).
    *
    * Determinism: `collect_list` is partition-order-dependent, so the
    * path is built by sorting the collected (ts, tie, type) structs —
    * `array_sort` over the struct's lexicographic order, a total
    * order because `tieBreak` is unique per user. Sessions are
    * bounded by the gap rule, so per-group state is bounded by the
    * session length (the same allowance as the streaming session
    * operator's state). */
  def sessionPaths(df: DataFrame, userCol: String, tsSeconds: Column,
      gapSeconds: Long, typeCol: String, tieBreak: Column,
      topN: Int = 20): DataFrame = {
    val s = sessions(df, userCol, tsSeconds, gapSeconds, tieBreak)
      .select(col(userCol), col("session_seq"), tsSeconds.as("ts__"),
        tieBreak.as("tie__"), col(typeCol).as("t__"))
    val paths = s
      .groupBy(col(userCol), col("session_seq"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("ts__"), col("tie__"),
          col("t__")))),
        x => x.getField("t__"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    RankOps.topK(paths, topN, col("n_sessions"), col("path"))
  }
}
