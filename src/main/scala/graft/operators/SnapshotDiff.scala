package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-level diff of two table snapshots — the audit twin of the S7
  * merge sink: what did today's upsert actually DO to the table?
  * (The reference upserts daily screener snapshots on `symbol`,
  * `uploadtodb.py:159-198`; change accounting is how a cron operator
  * notices a half-empty scrape before it propagates.)
  *
  * Per key: `change` ∈ added | removed | changed | unchanged, the
  * number of compared columns that differ, and the sorted
  * comma-joined names of the changed columns. Column comparison is
  * null-safe (`<=>`): null→value and value→null both count as a
  * change, null→null does not.
  *
  * Shape: ONE full-outer join on the key (the merge sink's own
  * shuffle), per-column flags as codegen'd expressions, the changed
  * list via `concat_ws` (skips nulls — no interpreted lambda). */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val o = oldDf.select((keyCol +: compareCols).map(c =>
      col(c).as(s"o_$c")): _*)
    val n = newDf.select((keyCol +: compareCols).map(c =>
      col(c).as(s"n_$c")): _*)
    val joined = o.join(n, col(s"o_$keyCol") === col(s"n_$keyCol"), "full_outer")
    val inOld = col(s"o_$keyCol").isNotNull
    val inNew = col(s"n_$keyCol").isNotNull
    val flags = compareCols.sorted.map(c =>
      c -> !(col(s"o_$c") <=> col(s"n_$c")))
    val nChanged = flags.map { case (_, f) => f.cast("long") }
      .reduce(_ + _)
    val changedList = concat_ws(",",
      flags.map { case (c, f) => when(f, lit(c)) }: _*)
    joined.select(
      coalesce(col(s"o_$keyCol"), col(s"n_$keyCol")).as(keyCol),
      when(inOld && !inNew, lit("removed"))
        .when(!inOld && inNew, lit("added"))
        .when(nChanged > 0L, lit("changed"))
        .otherwise(lit("unchanged")).as("change"),
      when(inOld && inNew, nChanged).otherwise(lit(0L)).as("n_cols_changed"),
      when(inOld && inNew, changedList).otherwise(lit("")).as("changed_cols"))
  }

  /** SCD Type-2 history build — collapse a per-key event/attribute
    * timeline into versioned validity intervals (gaps-and-islands):
    * one row per maximal run of a null-safe-equal `valueCol`, with
    * `version` (1-based per key), `valid_from_ns` / `valid_to_ns`
    * (half-open: `valid_to_ns` = next version's start, NULL while
    * current), run length, and an `is_current` flag. This is the
    * dimension-history table a warehouse derives from the reference's
    * daily snapshot upserts (`uploadtodb.py:159-198` overwrites in
    * place; SCD2 is what you build when you keep the history instead).
    *
    * Determinism: runs are defined over the TOTAL order
    * (`tsCol`, `tieCol`) within each key — `tieCol` must make the
    * ordering unique (e.g. an event id), otherwise which of two
    * same-timestamp values opens a version would be
    * partitioning-dependent. Null-safe comparison: a null→value or
    * value→null transition opens a new version; null→null does not.
    *
    * Shape at scale: one shuffle by key; two window families over the
    * same (key | ts,tie) ordering (Catalyst shares the sort), then a
    * per-(key,version) partial-aggregable groupBy and one tiny window
    * over versions. No global sort, no driver state. */
  def scd2History(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val runFrame = byTime.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val opens = when(row_number().over(byTime) === 1, 1L)
      .when(!(col(valueCol) <=> lag(col(valueCol), 1).over(byTime)), 1L)
      .otherwise(0L)
    val versioned = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("version", sum(opens).over(runFrame))
    val runs = versioned
      .groupBy(col(keyCol), col("version"))
      .agg(
        // all rows in a run share valueCol (that's what defines the
        // run); max() picks it while staying null-safe for null runs
        max(col(valueCol)).as("value"),
        min(col(tsCol)).as("valid_from_ns"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs.select(
      col(keyCol), col("version"), col("value"), col("valid_from_ns"),
      lead(col("valid_from_ns"), 1).over(byVersion).as("valid_to_ns"),
      col("n_events"))
      .withColumn("is_current", col("valid_to_ns").isNull)
  }
}
