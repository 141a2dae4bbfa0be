package graft

import graft.serve.Screeners

/** §2.11 serving envelope: the reference's `ScreenerResponse` model has
  * exactly {success, data, count, screener_type, timestamp, error}, in
  * that order, all always present (null serialized). */
class ScreenersSpec extends SparkSpec {
  import spark.implicits._

  private val keys =
    Seq("success", "data", "count", "screener_type", "timestamp", "error")

  private def keyOrder(json: String): Seq[Int] =
    keys.map(k => json.indexOf("\"" + k + "\":"))

  test("screener discovery lists the registry's btst/swing/position set") {
    assert(Screeners.listScreeners == Seq("btst", "position", "swing"))
  }

  test("success envelope carries all six ScreenerResponse keys in model order") {
    val scored = Seq(("AAA", 9.1, 8.0), ("BBB", 7.2, 6.5))
      .toDF("symbol", "composite_score", "fundamental_score")
    val resp = Screeners.respond(spark, "btst", scored)
    val pos = keyOrder(resp)
    assert(pos.forall(_ >= 0), s"missing keys in $resp")
    assert(pos == pos.sorted, s"keys out of model order in $resp")
    assert(resp.contains("\"success\":true"))
    assert(resp.contains("\"count\":2"))
    assert(resp.contains("\"screener_type\":\"btst\""))
    assert(resp.contains("\"error\":null"))
  }

  test("unknown screener answers success=false with the reference error text") {
    val scored = Seq(("AAA", 1.0, 1.0))
      .toDF("symbol", "composite_score", "fundamental_score")
    val resp = Screeners.respond(spark, "nope", scored)
    val pos = keyOrder(resp)
    assert(pos.forall(_ >= 0) && pos == pos.sorted)
    assert(resp.contains("\"success\":false"))
    assert(resp.contains("\"data\":null"))
    assert(resp.contains("\"count\":0"))
    assert(resp.contains("\"error\":\"Failed to fetch data for screener: nope\""))
  }

  test("query failure is caught into the envelope, not thrown") {
    // 'swing' filters on market_cap_category, absent here → analysis error
    val scored = Seq(("AAA", 1.0)).toDF("symbol", "composite_score")
    val resp = Screeners.respond(spark, "swing", scored)
    assert(resp.contains("\"success\":false"))
    assert(resp.contains("\"data\":null"))
    assert(resp.startsWith("{\"success\":false,\"data\":null,\"count\":0,"))
    // Spark analysis errors span multiple lines — the envelope must stay
    // valid JSON, i.e. no raw control characters survive the escape
    assert(!resp.exists(_ < ' '), "raw control char leaked into envelope")
  }
}
