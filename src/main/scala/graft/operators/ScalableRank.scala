package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def groupRank(df: DataFrame, groups: Seq[String], valueCol: String,
      outCol: String = "rank", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val sortCols = groups.map(col) :+ col(valueCol).asc_nulls_first
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // persisted once: both the offset pass and the position pass read it
    // (otherwise the second pass re-runs the global sort)
    val sorted = df.repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition row counts -> global offsets (tiny driver array)
    val counts = sorted.rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add("graft_pos__", LongType)
    val withPos = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
        var pos = bc.value(i)
        it.map { r => pos += 1; Row.fromSeq(r.toSeq :+ pos) }
      }, schema)
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
