package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null-safe group-stats join, shared by the operators that compute a
  * small per-group stats table and attach it back to the corpus
  * (Winsorize bounds, RobustScore median/MAD). A plain using-join
  * drops rows whose group KEY is NULL even though groupBy produced a
  * stats row for that group (window partitionBy treats NULL keys as a
  * real partition) — so the right side's group columns are renamed,
  * the condition is `<=>` per key, and the rename is dropped after.
  * The stats side is broadcast (per-group tables are tiny by
  * construction). */
object StatsJoin {

  /** `left` + non-group columns of `stats`, matched null-safely on
    * `groupCols`. */
  def attach(left: DataFrame, stats: DataFrame, groupCols: Seq[String],
      how: String): DataFrame = {
    val renamed = stats.select(
      groupCols.map(g => col(g).as(s"graft_sj_${g}__")) ++
        stats.columns.filterNot(groupCols.contains).map(col): _*)
    val cond = groupCols.map(g => left(g) <=> renamed(s"graft_sj_${g}__"))
      .reduce(_ && _)
    left.join(broadcast(renamed), cond, how)
      .drop(groupCols.map(g => s"graft_sj_${g}__"): _*)
  }
}
