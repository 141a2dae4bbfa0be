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
}
