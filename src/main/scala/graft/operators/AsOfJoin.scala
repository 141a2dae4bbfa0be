package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to each left row the most recent right row with
  * rightTs <= leftTs for the same key (the market-data trade↔quote
  * join; also the "latest feature value as of event time" join in
  * feature-store pipelines).
  *
  * Spark has no native as-of join; the scalable formulation is the
  * union + carry-forward trick (SURVEY §7 custom-operator preference
  * (a): compose existing ops):
  *   1. tag both sides, union on (key, ts, side), right payload packed
  *      into ONE struct so the whole matching ROW carries together
  *      (column-wise carry would mix rows when a right column is null);
  *   2. one window per key ordered by (ts, side):
  *      last(struct, ignoreNulls) over rows unbounded preceding;
  *   3. keep left rows, unpack the struct.
  * ONE shuffle on the key (both inputs flow into the same exchange) and
  * one in-partition sort — sort-merge-join cost, no range explosion, no
  * driver loops. Right rows with ts equal to a left row sort BEFORE it,
  * so equality matches (>=), standard ASOF semantics.
  *
  * Tie rule: several right rows sharing (key, ts) are canonicalized to
  * the MINIMUM payload struct (field-ordinal struct comparison — with a
  * unique id leading the payload, the lowest id wins) BEFORE the union,
  * so the chosen match is total-ordered and run/engine-deterministic
  * (the window's (ts, side) sort alone would leave last()/first() free
  * to pick either duplicate). The canonicalization is a
  * map-side-combinable min aggregate, so duplicate-heavy right sides
  * SHRINK before the union shuffle rather than costing extra.
  */
object AsOfJoin {

  /** One canonical right row per (key, rightTs): min payload struct. */
  private def canonicalRight(right: DataFrame, keys: Seq[String],
      rightTs: String, rightStruct: org.apache.spark.sql.Column,
      side: Int): DataFrame =
    right
      .select(keys.map(col) ++ Seq(col(rightTs).as("asof_ts__"),
        rightStruct.as("asof_r__")): _*)
      .groupBy((keys :+ "asof_ts__").map(col): _*)
      .agg(min(col("asof_r__")).as("asof_r__"))
      .withColumn("asof_side__", lit(side))

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightStruct = struct(rightPayload.map(col): _*)
    val rightTagged =
      canonicalRight(right, keys, rightTs, rightStruct, side = 0)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("asof_ts__"),
        lit(1).as("asof_side__")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("asof_ts__").asc, col("asof_side__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("asof_r__",
      last(col("asof_r__"), ignoreNulls = true).over(w))
    val unpacked = rightPayload.foldLeft(
      carried.filter(col("asof_side__") === 1)) { (d, c) =>
      d.withColumn(s"right_$c", col(s"asof_r__.$c"))
    }
    unpacked
      .drop("asof_side__", "asof_r__")
      .withColumnRenamed("asof_ts__", leftTs)
  }

  /** FORWARD as-of: attach the EARLIEST right row with rightTs >=
    * leftTs per key — "the next quote after the trade" / "the next
    * purchase after the click" (attribution windows, next-event
    * labeling for sequence models). Same one-shuffle union +
    * carry trick as [[leftAsOf]], mirrored: left rows sort BEFORE
    * right rows at equal ts (side 0 < 1) and `first(ignoreNulls)` runs
    * over (currentRow, unboundedFollowing), so an exactly-simultaneous
    * right row matches (>= semantics). Ties among right rows with
    * identical (key, ts) resolve to the minimum payload struct (the
    * class-level tie rule). */
  def leftAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightStruct = struct(rightPayload.map(col): _*)
    val rightTagged =
      canonicalRight(right, keys, rightTs, rightStruct, side = 1)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("asof_ts__"),
        lit(0).as("asof_side__")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("asof_ts__").asc, col("asof_side__").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("asof_r__",
      first(col("asof_r__"), ignoreNulls = true).over(w))
    val unpacked = rightPayload.foldLeft(
      carried.filter(col("asof_side__") === 0)) { (d, c) =>
      d.withColumn(s"right_$c", col(s"asof_r__.$c"))
    }
    unpacked
      .drop("asof_side__", "asof_r__")
      .withColumnRenamed("asof_ts__", leftTs)
  }

  /** NEAREST as-of: attach the right row whose timestamp is CLOSEST
    * to the left row's (pandas `merge_asof(direction='nearest')`),
    * ties broken backward. ONE union + ONE window shuffle computes
    * BOTH carries — `last(ignoreNulls)` looking back and
    * `first(ignoreNulls)` looking forward over the same (key, ts,
    * side) sort — then a projection picks the nearer side, so nearest
    * costs exactly what one directional as-of costs.
    *
    * Equal-timestamp subtlety: right rows sort BEFORE left rows at
    * the same ts, so an exactly-simultaneous right row is captured by
    * the BACKWARD carry at distance 0 (which beats any forward
    * candidate) — the forward carry's effective semantics are strict
    * `>`, and nearest remains exact. The right timestamp is always
    * surfaced as `right_<rightTs>` plus the sign flag `matched_back`
    * (did the nearest row precede the left row?). Right rows sharing
    * (key, ts) resolve to the minimum payload struct (class-level tie
    * rule), so the emitted payload is deterministic. */
  def leftAsOfNearest(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = (rightPayload :+ rightTs).distinct
    val rightStruct = struct(pay.map(col): _*)
    val rightTagged =
      canonicalRight(right, keys, rightTs, rightStruct, side = 0)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("asof_ts__"),
        lit(1).as("asof_side__")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col): _*)
    val unioned =
      leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("asof_ts__").asc, col("asof_side__").asc)
    val wBack = order.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wFwd = order.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val carried = unioned
      .withColumn("asof_b__", last(col("asof_r__"), ignoreNulls = true)
        .over(wBack))
      .withColumn("asof_f__", first(col("asof_r__"), ignoreNulls = true)
        .over(wFwd))
    val distB = col("asof_ts__") - col(s"asof_b__.$rightTs")
    val distF = col(s"asof_f__.$rightTs") - col("asof_ts__")
    val pickBack = col("asof_f__").isNull ||
      (col("asof_b__").isNotNull && distB <= distF)
    val chosen = carried.filter(col("asof_side__") === 1)
      .withColumn("asof_r__",
        when(pickBack, col("asof_b__")).otherwise(col("asof_f__")))
      .withColumn("matched_back",
        when(col("asof_r__").isNull, lit(null).cast("boolean"))
          .otherwise(pickBack))
    val unpacked = pay.foldLeft(chosen) { (d, c) =>
      d.withColumn(s"right_$c", col(s"asof_r__.$c"))
    }
    unpacked
      .drop("asof_side__", "asof_r__", "asof_b__", "asof_f__")
      .withColumnRenamed("asof_ts__", leftTs)
  }
}
