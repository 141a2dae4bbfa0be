package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget data selection: keep the best rows, in a caller-defined
  * quality order, until a cumulative cost budget is exhausted — the
  * "select N tokens of pretraining data" step of a training-data
  * pipeline (quality-ranked selection under a token budget, cf. the
  * data-selection stage described in the LLaMA/Gopher dataset papers).
  *
  * The semantics are a global ordered prefix: sort by `order`, take rows
  * while running_sum(cost) <= budget. A window
  * `sum(cost).over(orderBy(order))` computes exactly that but sorts the
  * WHOLE table in one task — the same single-partition straggler
  * [[ScalableRank]] exists to kill. Same cure here:
  *
  *   1. `repartitionByRange(order)` + in-partition sort — a true global
  *      sort, split across range partitions (RangePartitioner balances
  *      by sampling, so a skewed quality distribution still spreads);
  *   2. per-partition cost totals -> one tiny driver collect -> prefix
  *      offsets, broadcast back (P longs — driver state a prefix sum is
  *      allowed to have);
  *   3. running = offset(pid) + in-partition prefix sum, a window
  *      PARTITIONED by pid — P balanced window tasks, never one.
  *
  * The sorted frame is persisted so the totals pass and the output pass
  * read the same materialization. `order` must be a TOTAL order (break
  * ties with the row id) — with ties unbroken, "which of two equal rows
  * crosses the budget line" would be partitioning-dependent.
  *
  * Cost arithmetic is integer (longs): token counts are integral, and
  * an exact prefix sum keeps the budget cut reproducible across engines
  * and partitionings (a double running sum would reassociate).
  */
object BudgetSelect {

  /** The distributed exact prefix sum both [[selectUnderBudget]] and
    * [[Sampling.systematicWeighted]] ride on: appends `runningOut` =
    * running sum of `cost` in global `order`, and returns the grand
    * total alongside. NULL costs count as 0. `order` must be a total
    * order for a reproducible running column (ties make "which row
    * owns which prefix" partitioning-dependent) — EXCEPT when only
    * rank-block COUNTS matter downstream (the [[Drift]] boundary
    * construction), where equal-cost ties are harmless by design. */
  def runningTotal(df: DataFrame, cost: Column, order: Seq[Column],
      runningOut: String, partitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val costL = coalesce(cost.cast("long"), lit(0L))
    val sorted = graft.Caches.register(df
      .repartitionByRange(nParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("graft_pid__", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = sorted
      .groupBy(col("graft_pid__"))
      .agg(sum(costL).as("graft_t__"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = totals.map(_._2).scanLeft(0L)(_ + _)
    val offsetsDf = totals.map(_._1).zip(offsets).toSeq
      .toDF("graft_pid__", "graft_off__")
    // In-partition prefix sum: the window re-sorts by the SAME keys the
    // range partitioning sorted by, inside pid groups that the range
    // partitioner already balanced — no single-task stage anywhere.
    val w = Window.partitionBy(col("graft_pid__")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sorted
      .join(broadcast(offsetsDf), "graft_pid__")
      .withColumn(runningOut, col("graft_off__") + sum(costL).over(w))
      .drop("graft_pid__", "graft_off__")
    (out, offsets.last)
  }

  /** The EXCLUSIVE distributed prefix MAX — same range-partition +
    * per-partition-offset shape as [[runningTotal]], but the combining
    * monoid is max and the frame excludes the current row: appends
    * `outCol` = max of `value` over all STRICTLY EARLIER rows in
    * `order` (NULL for the first row). The scan kernel behind the
    * [[Skyline]] dominance test (and any "best so far" sweep).
    * `value` must be a long expression; `order` must be a total order
    * wherever per-row attribution matters. */
  def runningMaxExclusive(df: DataFrame, value: Column,
      order: Seq[Column], outCol: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = graft.Caches.register(df
      .repartitionByRange(nParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("graft_pid__", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = sorted
      .groupBy(col("graft_pid__"))
      .agg(max(value.cast("long")).as("graft_m__"))
      .as[(Int, Option[Long])].collect().sortBy(_._1)
    // offset(p) = max over all partitions BEFORE p (empty -> None)
    val offsets = totals.map(_._2)
      .scanLeft(None: Option[Long]) { (a, b) =>
        (a ++ b).reduceOption(_ max _) }.init
    val offsetsDf = totals.map(_._1).zip(offsets)
      .map { case (p, m) => (p, m.map(Long.box).orNull) }.toSeq
      .toDF("graft_pid__", "graft_off__")
    val w = Window.partitionBy(col("graft_pid__")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .join(broadcast(offsetsDf), "graft_pid__")
      .withColumn(outCol,
        greatest(col("graft_off__"), max(value.cast("long")).over(w)))
      .drop("graft_pid__", "graft_off__")
  }

  /** Rows of `df` whose running `cost` total, accumulated in `order`,
    * stays within `budget` (inclusive). Appends `runningOut` (the
    * running total, a long). NULL costs count as 0 — a row with no
    * measurable cost cannot consume budget, and dropping it silently
    * would make the selection non-monotonic in the budget. */
  def selectUnderBudget(df: DataFrame, cost: Column, order: Seq[Column],
      budget: Long, runningOut: String = "cum_cost",
      partitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    runningTotal(df, cost, order, runningOut, partitions)._1
      .filter(col(runningOut) <= budget)
  }
}
