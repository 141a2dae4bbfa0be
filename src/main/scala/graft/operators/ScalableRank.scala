package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed group-wise rank — the skew-proof twin of
  * `rank().over(Window.partitionBy(groups).orderBy(value))`.
  *
  * A window sorts each partition IN ONE TASK; a group holding 40% of a
  * 100 TB table is a straggler Spark cannot split (AQE does not split
  * windows). Here the sort is a RangePartitioner global sort over
  * (groups, value) — a skewed group simply spans many range partitions —
  * and rank arithmetic is reassembled from three linear aggregates:
  *
  *   pos        = global position in the (groups, value) sort order
  *                (per-partition offsets, zipWithIndex-style);
  *   groupStart = min(pos) per group;
  *   tieStart   = min(pos) per (group, value);
  *   rank       = tieStart - groupStart + 1   (ties share the first
  *                position, exactly like rank()).
  *
  * NULL values sort first (matching asc_nulls_first) and the tie join is
  * null-safe, so null-valued rows rank like the window form.
  */
object ScalableRank {

  /** Range-sort `df` by `sortCols` and attach its global 1-based
    * position in that order as `posCol` — the zipWithIndex shape, kept
    * entirely in Tungsten. `monotonically_increasing_id` embeds
    * (partition id << 33 | record number) during the sorted
    * materialization, so per-partition counts become ONE codegen'd
    * aggregate over the embedded partition id (no `it.size` pass
    * materializing rows), and the position is offset + record number via
    * a broadcast join of the tiny (pid, offset) table — no RDD
    * round-trip, no Row.fromSeq, rows stay in unsafe format end to end.
    * The returned frame is persisted (MEMORY_AND_DISK): the count pass
    * and every downstream pass read the same materialized sort, which
    * also pins the nondeterministic ids. The id layout caps partitions
    * at 2^33 rows — far beyond any memory-sized partition. */
  private[operators] def withGlobalPosition(df: DataFrame,
      sortCols: Seq[Column], nParts: Int, posCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val repart = if (nParts > 0) df.repartitionByRange(nParts, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    val sorted = graft.Caches.register(
      repart.sortWithinPartitions(sortCols: _*)
        .withColumn("graft_mid__", monotonically_increasing_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = sorted
      .groupBy(shiftright(col("graft_mid__"), 33).as("graft_pid__"))
      .agg(count(lit(1)).as("graft_cnt__"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val offsetsDf = counts.map(_._1).zip(offsets).toSeq
      .toDF("graft_pid__", "graft_off__")
    sorted
      .withColumn("graft_pid__", shiftright(col("graft_mid__"), 33))
      .join(broadcast(offsetsDf), "graft_pid__")
      .withColumn(posCol, col("graft_off__") +
        col("graft_mid__").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("graft_pid__", "graft_off__", "graft_mid__")
  }

  def groupRank(df: DataFrame, groups: Seq[String], valueCol: String,
      outCol: String = "rank", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val sortCols = groups.map(col) :+ col(valueCol).asc_nulls_first
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val withPos = withGlobalPosition(df, sortCols, nParts, "graft_pos__")
    val groupStart = withPos.groupBy(groups.map(col): _*)
      .agg(min(col("graft_pos__")).as("graft_gstart__"))
    val tieStart = withPos.groupBy((groups :+ valueCol).map(col): _*)
      .agg(min(col("graft_pos__")).as("graft_tstart__"))
      .withColumnRenamed(valueCol, "graft_tv__")
    val tieCond = groups.map(g => withPos(g) === tieStart(g))
      .reduce(_ && _) && (withPos(valueCol) <=> tieStart("graft_tv__"))
    withPos
      .join(groupStart, groups)
      .join(tieStart, tieCond)
      .withColumn(outCol, col("graft_tstart__") - col("graft_gstart__") + 1)
      .drop("graft_pos__", "graft_gstart__", "graft_tstart__", "graft_tv__")
      .drop(tieStart, groups.map(tieStart(_)))
  }

  /** Drop helper: remove join-duplicated group columns from the right
    * side after a non-using join. */
  implicit private class DropRight(df: DataFrame) {
    def drop(right: DataFrame, cols: Seq[Column]): DataFrame =
      cols.foldLeft(df)((d, c) => d.drop(c))
  }

  /** Skew-proof `row_number().over(partitionBy(groups).orderBy(sortCols))`
    * plus the group size — the building block the exact-quantile
    * operators (Winsorize, RobustScore, q35-style boundary picks) need:
    * row number `rnCol` (1-based, ties in distinct positions like the
    * window form) and group row count `nCol`, with NO per-group
    * single-task sort. Same machinery as [[groupRank]]: one global
    * range sort over (groups, sortCols) — a huge group spans many range
    * partitions — then rn = pos − min(pos per group) + 1 from one
    * linear aggregate. The group-stats join is null-safe, so NULL
    * group keys keep their rows (window parity). Tie order within
    * equal sort keys is arbitrary, exactly as an untiebroken window
    * row_number — callers picking values AT a row number must pick the
    * sort key itself (quantile boundary picks do). */
  def groupRowNumber(df: DataFrame, groups: Seq[String], sortCols: Seq[Column],
      rnCol: String = "rn", nCol: String = "n",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val withPos = withGlobalPosition(df, groups.map(col) ++ sortCols,
      nParts, "graft_pos__")
    // right-side group columns are renamed before the join so the
    // null-safe condition is unambiguous (no self-join attribute
    // aliasing to resolve)
    val gstats = withPos.groupBy(groups.map(col): _*)
      .agg(min(col("graft_pos__")).as("graft_gstart__"),
        count(lit(1)).as(nCol))
      .select(groups.map(g => col(g).as(s"graft_g_${g}__")) :+
        col("graft_gstart__") :+ col(nCol): _*)
    val cond = groups.map(g => col(g) <=> col(s"graft_g_${g}__"))
      .reduce(_ && _)
    withPos.join(gstats, cond)
      .withColumn(rnCol, col("graft_pos__") - col("graft_gstart__") + 1)
      .drop("graft_pos__" +: "graft_gstart__" +:
        groups.map(g => s"graft_g_${g}__"): _*)
  }

  /** Skew-proof strict-percentile per group: 100 * (#values strictly
    * below) / (#non-null values), <2 valid -> 50, null -> null — the
    * cluster-scale assembly of `PeerPercentile`'s single-level math from
    * `groupRank` + two aggregates. */
  def groupPercentile(df: DataFrame, groups: Seq[String], valueCol: String,
      outCol: String = "pct"): DataFrame = {
    val ranked = groupRank(df, groups, valueCol, "graft_rank__")
    val stats = df.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("graft_size__"), count(col(valueCol)).as("graft_nn__"))
    ranked.join(stats, groups)
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .when(col("graft_nn__") < 2, lit(50.0))
          .otherwise(lit(100.0) *
            (col("graft_rank__") - 1 - (col("graft_size__") - col("graft_nn__")))
              .cast("double") / col("graft_nn__").cast("double")))
      .drop("graft_rank__", "graft_size__", "graft_nn__")
  }
}
