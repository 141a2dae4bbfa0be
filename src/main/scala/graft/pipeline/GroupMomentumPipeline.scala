package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleanse
import graft.operators.RankOps

/** The reference's sector/industry momentum scoring
  * (ref sectorscore.py / indscores.py): parse stringly-typed numerics,
  * min-max normalize each column over the whole table, three weighted
  * blends (3m/6m/1y horizons), 4dp.
  *
  * NaN semantics preserved: a missing metric stays NULL through
  * normalization and poisons the weighted sum (pandas NaN propagation,
  * sectorscore.py:80-82) — even for 0-weighted terms.
  *
  * The tables are tiny (20 sectors / 119 industries) so the global
  * min-max window is a non-issue; `keyCol` partitioning would apply if a
  * grouping column were introduced at scale.
  */
object GroupMomentumPipeline {

  val metricCols: Seq[String] = Seq("market_cap", "change_pct", "perf_1w",
    "perf_1m", "perf_3m", "perf_6m", "perf_ytd", "perf_1y", "stocks")

  /** sectorscore.py:49-62 (indscores.py uses key 'change_x'; pass a
    * renamed frame). */
  val weights3m: Seq[(String, Double)] = Seq("change_pct" -> 20, "perf_1w" -> 10,
    "perf_1m" -> 20, "perf_3m" -> 30, "perf_6m" -> 10, "perf_ytd" -> 5,
    "perf_1y" -> 5, "market_cap" -> 0, "stocks" -> 0)
  val weights6m: Seq[(String, Double)] = Seq("change_pct" -> 15, "perf_1w" -> 8,
    "perf_1m" -> 15, "perf_3m" -> 20, "perf_6m" -> 25, "perf_ytd" -> 10,
    "perf_1y" -> 7, "market_cap" -> 0, "stocks" -> 0)
  val weights1y: Seq[(String, Double)] = Seq("change_pct" -> 10, "perf_1w" -> 5,
    "perf_1m" -> 10, "perf_3m" -> 15, "perf_6m" -> 20, "perf_ytd" -> 10,
    "perf_1y" -> 15, "market_cap" -> 10, "stocks" -> 5)

  def apply(df: DataFrame): DataFrame = {
    val present = metricCols.filter(df.columns.contains)
    // F1 parse ('−1.2%', '2.5T INR', '1,234') -> double
    val parsed = present.foldLeft(df) { (d, c) =>
      d.withColumn(c, Cleanse.cleanNumber(col(c)))
    }
    // W5 min-max normalize (constant column -> 1.0, NULL stays NULL)
    val normed = present.foldLeft(parsed) { (d, c) =>
      d.withColumn(s"normalized_$c", RankOps.minMaxNorm(col(c)))
    }
    def score(ws: Seq[(String, Double)]) =
      round(ws.filter { case (c, _) => present.contains(c) }
        .map { case (c, w) => col(s"normalized_$c") * w }
        .reduce(_ + _), 4)
    normed
      .withColumn("normalized_score_3m", score(weights3m))
      .withColumn("normalized_score_6m", score(weights6m))
      .withColumn("normalized_score_1y", score(weights1y))
  }
}
