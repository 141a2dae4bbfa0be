package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive: keep a per-key aggregate table up to date by MERGING a
  * delta batch's aggregate state into the standing state, never
  * re-reading the base (the reference recomputes every scoring table
  * from scratch each cron run — `run_technical.sh` — which is exactly
  * what stops working at 100 TB; this is the O(delta) alternative).
  *
  * The state tuple (n, sum_units, min_units, max_units) is chosen to
  * be MERGEABLE: each component combines associatively and
  * commutatively, so state(base ∪ delta) = merge(state(base),
  * state(delta)) exactly — the q132 gate asserts that identity
  * against a full recompute in the oracle engine. Sums are integer
  * units through exact decimal accumulators (order-invariant); the
  * derived mean is a signed exact-rounded e-unit ratio. (min/max are
  * mergeable for inserts only — deletes need a full refresh or a
  * sketch; documented non-goal, same contract as every merge-on-
  * append state store.)
  *
  * Shape at scale: aggState is one map-side-combinable groupBy; merge
  * is a full-outer join on the key — both sides arrive hash-
  * partitioned on that key from their own aggregations, so the join
  * reuses the partitioning (no third shuffle). Delta is typically
  * tiny → AQE broadcasts it. */
object AggMaintenance {

  /** Per-key mergeable state over an integral-unit expression:
    * (keys..., n, sum_units, min_units, max_units). NULL units are
    * excluded from all four components (n counts non-null values). */
  def aggState(df: DataFrame, keys: Seq[String],
      valueUnits: Column): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(keys.map(col) :+ valueUnits.cast("long").as("u__"): _*)
      .filter(col("u__").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("u__").cast(dec)).as("sum_units"),
        min(col("u__")).as("min_units"),
        max(col("u__")).as("max_units"))
  }

  /** Merge two state tables (same schema as [[aggState]] output) into
    * the combined state, appending the derived exact-rounded mean
    * (`mean_units`, rounded to integer units). Keys present in either
    * side survive. */
  def mergeStates(base: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(keys.map(col) ++ Seq(col("n").as(s"n_$tag"),
        col("sum_units").as(s"s_$tag"), col("min_units").as(s"mn_$tag"),
        col("max_units").as(s"mx_$tag")): _*)
    val joined = side(base, "a").join(side(delta, "b"),
      keys, "full_outer")
    val n = coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))
    val dec = "decimal(38,0)"
    val zero = lit(0L).cast(dec)
    val s = coalesce(col("s_a"), zero) + coalesce(col("s_b"), zero)
    joined.select(keys.map(col) ++ Seq(
      n.as("n"),
      // long carrier for the gate surface; a fleet-scale deployment
      // keeps the decimal column itself
      s.cast("long").as("sum_units"),
      least(col("mn_a"), col("mn_b")).as("min_units"),
      greatest(col("mx_a"), col("mx_b")).as("max_units"),
      ExactRound.ratioScaledSigned(s, n, 0).as("mean_units")): _*)
  }
}
