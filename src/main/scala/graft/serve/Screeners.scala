package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RankOps

/** §2.11 — the serving surface: named screener queries + JSON emission
  * (S11). The reference's FastAPI server maps screener names to scrape
  * URLs and returns CSV-as-JSON (`tradingview_api_server` /
  * `SCREENER_URLS` bytecode); here a screener is a named DataFrame
  * transformation over `stock_data`+`stock_rankings`-shaped frames, and
  * the emit path is `toJsonRecords` (collect only the final small
  * result — never an intermediate).
  *
  * Auth / rate limiting are HTTP-framework concerns that sit in front of
  * this registry, out of engine scope.
  */
object Screeners {

  /** Named screeners, mirroring the reference's btst/swing/position set:
    * each is top-N by a score at a band granularity. */
  val registry: Map[String, DataFrame => DataFrame] = Map(
    "btst" -> (df => RankOps.topK(df, 20,
      col("composite_score"), col("symbol"))),
    "swing" -> (df => RankOps.topK(
      df.filter(col("market_cap_category").isin("Large Cap", "Mid Cap")), 20,
      col("composite_score"), col("symbol"))),
    "position" -> (df => RankOps.topK(df, 20,
      col("fundamental_score"), col("symbol"))))

  def run(name: String, scored: DataFrame): DataFrame =
    registry(name)(scored)

  /** S11 CSV→JSON emit (`csv_to_json` in the recovered bytecode): one
    * JSON object per row, driver-side only for final small results. */
  def toJsonRecords(result: DataFrame, limit: Int = 1000): Seq[String] =
    result.limit(limit).toJSON.collect().toSeq

  /** Response envelope mirroring the reference's
    * {success, data, count, screener_type, timestamp}. */
  def respond(spark: SparkSession, name: String, scored: DataFrame): String = {
    val rows = toJsonRecords(run(name, scored))
    val ts = java.time.Instant.now().toString
    s"""{"success":true,"count":${rows.size},"screener_type":"$name","timestamp":"$ts","data":[${rows.mkString(",")}]}"""
  }
}
