package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling equi-join: salt the skewed (large) side's key space
  * n-ways and replicate the build side once per salt, so a hot key's
  * rows spread over n reducers instead of one straggler task.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when a single key exceeds what one task can hold
  * even after AQE splitting (e.g. joining 100 TB of events against a
  * dimension where 30% of rows share one key), or when the join sits
  * under an operator AQE won't split (e.g. a window).
  */
object SkewJoin {

  /** Inner/left equi-join `big ⋈ small` on `key`, salting `big` with a
    * deterministic hash of `bigUnique` (any column unique-ish per row —
    * an id, not the join key) and exploding `small` across all salts.
    * Result equals the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      bigUnique: Column, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltCol = "graft_salt__"
    val l = big.withColumn(saltCol, pmod(xxhash64(bigUnique), lit(salts.toLong)).cast("int"))
    val r = small.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Skew-safe grouped count/sum: two-phase aggregate with a salt in the
    * first phase — the map-side combine equivalent for a single giant
    * group dominating a groupBy. Aggregations must be algebraic
    * (re-aggregatable): pass partials like sum/count. */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
      valueCol: String): DataFrame = {
    val saltCol = "graft_salt__"
    df.withColumn(saltCol, pmod(xxhash64(col(valueCol)), lit(salts.toLong)))
      .groupBy(col(key), col(saltCol))
      .agg(count(lit(1)).as("n_"), sum(col(valueCol)).as("s_"))
      .groupBy(col(key))
      .agg(sum(col("n_")).as("n"), sum(col("s_")).as("sum"))
  }
}
