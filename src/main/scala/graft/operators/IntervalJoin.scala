package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join at scale: attach to each point row every
  * interval row (same optional keys) with start <= point <= end —
  * session attribution, validity-window lookups, time-range tagging.
  *
  * Spark plans a raw non-equi join as BroadcastNestedLoop (needs a
  * broadcastable side) or a cartesian product — both die at corpus
  * scale. The scalable formulation turns the range predicate into an
  * EQUI-join on a time bucket:
  *   - an interval [s, e] explodes to every bucket of width `w` it
  *     overlaps — floor(s/w)..floor(e/w), span/w + 1 rows;
  *   - a point belongs to exactly ONE bucket, so each true (point,
  *     interval) pair meets exactly once — no post-join dedup;
  *   - the equi-join on (keys…, bucket) shuffles both sides once and
  *     AQE's skew handling applies to it like any other join;
  *   - the exact range filter runs codegen'd on the joined rows.
  *
  * `bucketWidth` is the cost knob: exploded interval rows scale as
  * Σ span/w (pick w near the TYPICAL interval span so most intervals
  * land in 1-2 buckets), while false candidates per point are bounded
  * by the intervals overlapping its bucket. Degenerate giant intervals
  * are capped by `maxBucketsPerInterval` — fail fast instead of
  * silently exploding a million-row interval (an interval that long is
  * a data bug or wants a coarser width).
  *
  * Bucket arithmetic is true floor division (floorDiv via pmod), so
  * negative timestamps bucket correctly. */
object IntervalJoin {

  /** True floor division x div w on longs, kept in INTEGER arithmetic
    * end to end: (x − pmod(x, w)) is an exact multiple of w, and the
    * quotient comes from Catalyst's IntegralDivide — a double-precision
    * `/` would corrupt quotients once |x| exceeds 2^53 (nanosecond
    * timestamps). */
  private def floorDiv(x: org.apache.spark.sql.Column, w: Long) = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val xm = (x - pmod(x, lit(w))).cast("long")
    GraftSqlBridge.column(IntegralDivide(
      GraftSqlBridge.expression(xm),
      GraftSqlBridge.expression(lit(w))))
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      keys: Seq[String] = Nil, bucketWidth: Long = 3600L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val nb = floorDiv(col(endCol), bucketWidth) -
      floorDiv(col(startCol), bucketWidth) + 1
    val ib = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("graft_nb__", nb)
      .withColumn("graft_nb__",
        when(col("graft_nb__") <= maxBucketsPerInterval, col("graft_nb__"))
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $maxBucketsPerInterval buckets "
              + s"of width $bucketWidth; widen bucketWidth "), col(startCol),
            lit(".."), col(endCol)))))
      .withColumn("graft_bucket__",
        explode(sequence(floorDiv(col(startCol), bucketWidth),
          floorDiv(col(startCol), bucketWidth) + col("graft_nb__") - 1)))
      .drop("graft_nb__")
    val pb = points.withColumn("graft_bucket__",
      floorDiv(col(pointTs), bucketWidth))
    pb.join(ib, keys :+ "graft_bucket__")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("graft_bucket__")
  }

  /** RANGE-OVERLAP join — both sides are intervals; emit every
    * (left, right) pair whose CLOSED ranges intersect
    * (lStart <= rEnd AND rStart <= lEnd), optionally equi-keyed. The
    * same bucket decomposition as [[pointInInterval]] turns the theta
    * join into an equi join on (keys, bucket); a pair sharing several
    * buckets is emitted ONCE by the classic first-common-bucket rule —
    * keep the pair only in the bucket where the overlap begins
    * (bucket == max(floor(lStart/w), floor(rStart/w))), a pure filter,
    * no dedup shuffle.
    *
    * Column names must be disjoint across the two inputs (pre-rename,
    * as the other join operators require). `bucketWidth` is the scale
    * knob: width ≈ the typical interval length keeps the per-interval
    * explode factor near 2 and bucket occupancy balanced. */
  def rangeOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keys: Seq[String] = Nil, bucketWidth: Long = 3600L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = {
      val nb = floorDiv(col(e), bucketWidth) -
        floorDiv(col(s), bucketWidth) + 1
      df.filter(col(s) <= col(e))
        .withColumn("graft_nb__",
          when(nb <= maxBucketsPerInterval, nb)
            .otherwise(raise_error(concat(
              lit(s"interval spans more than $maxBucketsPerInterval " +
                s"buckets of width $bucketWidth "), col(s), lit(".."),
              col(e)))))
        .withColumn("graft_bucket__",
          explode(sequence(floorDiv(col(s), bucketWidth),
            floorDiv(col(s), bucketWidth) + col("graft_nb__") - 1)))
        .drop("graft_nb__")
    }
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), keys :+ "graft_bucket__")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("graft_bucket__") ===
        greatest(floorDiv(col(lStart), bucketWidth),
          floorDiv(col(rStart), bucketWidth)))
      .drop("graft_bucket__")
  }
}
