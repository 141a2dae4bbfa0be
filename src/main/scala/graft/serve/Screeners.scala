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

  /** `/screeners` discovery analog — the reference's
    * `list_available_screeners` returns its name→source map
    * (`SCREENER_URLS.copy()`); here the registry's names, sorted. */
  def listScreeners: Seq[String] = registry.keys.toSeq.sorted

  /** S11 CSV→JSON emit (`csv_to_json` in the recovered bytecode): one
    * JSON object per row, driver-side only for final small results. */
  def toJsonRecords(result: DataFrame, limit: Int = 1000): Seq[String] =
    result.limit(limit).toJSON.collect().toSeq

  /** Response envelope with the reference's exact `ScreenerResponse`
    * fields, in model order and always present (pydantic serializes
    * every field, null included): {success, data, count, screener_type,
    * timestamp, error} — `tradingview_api_server` bytecode,
    * `ScreenerResponse` model. On failure the reference answers
    * success=false with data null, count 0, and the error message
    * (`"Failed to fetch data for screener: {type}"` / `str(e)`). */
  def envelope(name: String, rows: Seq[String], error: Option[String]): String = {
    val ts = java.time.Instant.now().toString
    val data = if (error.isDefined) "null" else rows.mkString("[", ",", "]")
    val count = if (error.isDefined) 0 else rows.size
    // full escape via JsonText: Spark exception messages span lines and
    // would otherwise emit a raw newline inside the "error" string
    val err = error.map(graft.functions.JsonText.quote).getOrElse("null")
    s"""{"success":${error.isEmpty},"data":$data,"count":$count,""" +
      s""""screener_type":${graft.functions.JsonText.quote(name)},"timestamp":"$ts","error":$err}"""
  }

  def respond(spark: SparkSession, name: String, scored: DataFrame): String =
    registry.get(name) match {
      case Some(fn) =>
        try envelope(name, toJsonRecords(fn(scored)), None)
        catch { case e: Exception =>
          envelope(name, Nil, Some(e.toString))
        }
      case None =>
        envelope(name, Nil, Some(s"Failed to fetch data for screener: $name"))
    }
}
