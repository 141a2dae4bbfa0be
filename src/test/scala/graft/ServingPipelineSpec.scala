package graft

import java.nio.file.Files
import graft.pipeline.ServingPipeline

/** The §2.11/§3.4 lifecycle end to end: a raw TradingView-headered CSV
  * through ingest → composite scoring → screener envelope, asserted on
  * the final JSON — the single wired demonstration of the serve path
  * (each stage also has its own unit gate). */
class ServingPipelineSpec extends SparkSpec {

  private def writeFixtureCsv(): String = {
    // Raw screener headers (uploadtodb.py:74-124 names). RSI is the only
    // varying metric; I1 holds three members (inner z-score), I2 a
    // singleton (sector fallback x0.8) — the PipelineSpec shape, but
    // arriving AS A FILE with messy numerics ("1,000.5", empty cells).
    val rows = Seq(
      "Symbol,Description,Sector,Industry,Market capitalization,Relative Strength Index (14) 1 day,Price,Analyst Rating",
      "AAA,Alpha,S,I1,\"6,000,000,000\",10.5,100.0,Hold",
      "BBB,Beta,S,I1,5000000000,20.5,100.0,Hold",
      "CCC,Gamma,S,I1,4000000000,30.5,100.0,Hold",
      "DDD,Delta,S,I2,3000000000,40.5,100.0,Hold",
      ",HeaderEcho,S,I2,1,1,1,Hold")         // empty key -> filtered (P3)
    val dir = Files.createTempDirectory("serving-csv")
    val f = dir.resolve("funda_2026-01-01.csv")
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  test("CSV -> composite score -> screener envelope, one wired path") {
    val path = writeFixtureCsv()
    val resp = ServingPipeline.respondFromCsv(spark, path, "btst")
    assert(resp.contains("\"success\":true"), resp)
    assert(resp.contains("\"count\":4"), resp)          // empty-key row dropped
    assert(resp.contains("\"screener_type\":\"btst\""))
    // top of the btst ranking = highest composite score = highest RSI
    // z-score; data is ordered, so DDD (sector-fallback, rsi 40.5)
    // or CCC (inner z +3) leads — assert the ranking property rather
    // than a pinned winner: every symbol present, CCC before AAA
    assert(resp.indexOf("CCC") >= 0 && resp.indexOf("AAA") >= 0)
    assert(resp.indexOf("CCC") < resp.indexOf("AAA"),
      s"CCC (z=+3) must outrank AAA (z=-3) in $resp")
  }

  test("scored frame carries the serve-side columns") {
    val path = writeFixtureCsv()
    val scored = ServingPipeline.scoreFromCsv(spark, path)
    val cols = scored.columns.toSet
    assert(Set("symbol", "composite_score", "market_cap_category")
      .subsetOf(cols))
    assert(scored.count() == 4)
  }

  test("unknown screener still answers the model-shaped failure envelope") {
    val path = writeFixtureCsv()
    val resp = ServingPipeline.respondFromCsv(spark, path, "nope")
    assert(resp.contains("\"success\":false"))
    assert(resp.contains("\"error\":\"Failed to fetch data for screener: nope\""))
  }
}
