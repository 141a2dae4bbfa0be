package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics beyond sessionization: burst (anomaly)
  * detection against a trailing baseline, and rolling-window distinct
  * actives. Both are all-integer surfaces (epoch-second arithmetic,
  * cross-multiplied thresholds) so their gates carry no floating point.
  */
object EventAnalytics {

  /** Hours whose event count spikes above `multNum/multDen` times the
    * trailing per-hour average for the same event type.
    *
    * Two stages: an hourly pre-aggregate (map-side combinable — the
    * input shuffle carries (type, hour) partial counts, never raw
    * events), then one window per event type over the TRAILING
    * `trailingHours` OBSERVED hour rows (`ROWS BETWEEN t PRECEDING AND
    * 1 PRECEDING` — hours with zero events are absent, so the baseline
    * is "recent active hours", deliberately; a gap-filled calendar
    * frame would need a generated dimension and buys nothing for spike
    * detection). `minTrailing` suppresses flags before the baseline
    * has enough history to mean anything.
    *
    * The spike test is integer cross-multiplication —
    * `n·trail_n·multDen ≥ multNum·trail_sum` ⇔
    * n ≥ (multNum/multDen)·avg — so the gate never divides.
    *
    * Scale: the window partitions by event type; cardinality(type) is
    * small, but each partition holds only HOURS (8,760/year), not
    * events, so even a single-type stream is a few thousand rows per
    * year per partition — driver-safe and executor-trivial at any
    * event volume. The heavy lifting (raw events → hourly counts) is
    * the fully parallel pre-aggregate.
    */
  def burstHours(events: DataFrame, typeCol: String, tsNanosCol: String,
      trailingHours: Int = 24, minTrailing: Int = 12,
      multNum: Int = 2, multDen: Int = 1): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        (col(tsNanosCol).cast("long").div_(1000000000L).div_(3600L) * 3600L)
          .as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val fr = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-trailingHours.toLong, -1L)
    hourly
      .withColumn("trail_n", count(lit(1)).over(fr))
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(fr), lit(0L)))
      .filter(col("trail_n") >= minTrailing &&
        col("n_events") * col("trail_n") * lit(multDen.toLong) >=
          lit(multNum.toLong) * col("trail_sum"))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("trail_n"), col("trail_sum"))
  }

  /** Rolling `windowDays`-day distinct active users, one row per day
    * OBSERVED in the data.
    *
    * The scalable formulation inverts the range join: each distinct
    * (user, day) activity row is exploded to the `windowDays` future
    * days it contributes to, de-duplicated on (user, contrib_day), and
    * counted — three linear shuffles with map-side combine, versus a
    * days×activity range join whose matched row count is identical but
    * whose JOIN has no equi-key (falls to broadcast-nested-loop on big
    * inputs). The observed-days semi-join keeps the grid honest at the
    * corpus edge (days past max(day) would otherwise report partial
    * windows) and broadcasts — it is one row per distinct day, a few
    * thousand rows per decade.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String,
      tsNanosCol: String, windowDays: Int = 7): DataFrame = {
    val ud = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("user_id"),
        col(tsNanosCol).cast("long").div_(1000000000L).div_(86400L).as("day"))
      .distinct()
    val observed = ud.select(col("day")).distinct()
    ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1).cast("long")))
          .as("day"))
      .distinct()
      .join(broadcast(observed), "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** True FLOOR division as a Column op (delegates to
    * [[graft.functions.TimeFns.floorDiv]]) — Spark's bare `div`
    * truncates toward zero, which disagrees with the oracle's `//` on
    * pre-1970 timestamps. */
  private implicit class LongDiv(private val c: Column) {
    def div_(d: Long): Column = graft.functions.TimeFns.floorDiv(c, d)
  }
}
