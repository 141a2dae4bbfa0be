package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.Orchestration
import graft.serve.Screeners

/** End-to-end: technical CSV -> stock_data -> composite scores ->
  * rankings; fundamental CSV merges onto the same rows; screeners serve
  * from the result. The full reference daily+weekly cycle on files. */
class OrchestrationSpec extends SparkSpec {
  import spark.implicits._

  test("technical + fundamental cycle over a file warehouse") {
    val dir = Files.createTempDirectory("graft_e2e")
    val wh = s"$dir/warehouse"

    // 6 symbols across 2 sectors / 3 industries with enough numeric
    // spread to produce non-trivial scores
    val techCsv = (Seq(
      "Symbol,Sector,Industry,Price,Market capitalization,Analyst Rating," +
        "Relative Strength Index (14) 1 day,Performance % 1 week") ++
      Seq(
        "AAA,Energy,Oil,100,6000000000,Buy,61,2.5",
        "BBB,Energy,Oil,90,5000000000,Hold,55,1.0",
        "CCC,Energy,Oil,80,4000000000,Sell,40,-1.5",
        "DDD,Energy,Gas,70,3000000000,Buy,70,3.0",
        "EEE,Tech,Software,60,2000000000,Strong Buy,65,4.0",
        "FFF,Tech,Software,50,1000000000,Neutral,40,0.5")).mkString("\n")
    Files.writeString(dir.resolve("Technicals_2026-01-01.csv"), techCsv)

    val scored = Orchestration.runTechnical(
      spark, s"$dir/Technicals_*.csv", wh)
    assert(scored.isDefined)
    val rankings = graft.sinks.MergeByKey.readCommitted(spark, s"$wh/stock_rankings")
    assert(rankings.count() == 6)
    assert(rankings.filter($"market_cap_category" === "Large Cap").count() == 6)
    assert(rankings.select($"composite_score").filter($"composite_score" =!= 0.0).count() > 0)

    // weekly fundamentals merge onto the SAME stock_data rows
    // headers containing commas are quoted, as in the real screener export
    val fundaCsv = (Seq(
      "Symbol,Sector,Industry,\"Return on equity %, Trailing 12 months\"," +
        "Price to earnings ratio") ++
      Seq(
        "AAA,Energy,Oil,25,12", "BBB,Energy,Oil,18,18", "CCC,Energy,Oil,9,25",
        "DDD,Energy,Gas,30,8", "EEE,Tech,Software,40,35", "FFF,Tech,Software,5,-4"))
      .mkString("\n")
    Files.writeString(dir.resolve("funda_2026-01-05.csv"), fundaCsv)

    val ranked = Orchestration.runFundamental(spark, s"$dir/funda_*.csv", wh)
    assert(ranked.isDefined)
    val stock = graft.sinks.MergeByKey.readCommitted(spark, s"$wh/stock_data")
    // technical AND fundamental columns coexist on merged rows
    val aaa = stock.filter($"symbol" === "AAA").collect()(0)
    assert(aaa.getAs[Double]("rsi_14_1_day") == 61.0)
    assert(aaa.getAs[Double]("return_on_equity_ttm") == 25.0)

    val finalRankings = graft.sinks.MergeByKey.readCommitted(spark, s"$wh/stock_rankings")
    assert(finalRankings.columns.contains("fundamental_score"))
    assert(finalRankings.filter($"fundamental_rank" >= 1).count() == 6)

    // serving surface over the merged rankings
    val resp = Screeners.respond(spark, "position", finalRankings)
    assert(resp.contains("\"success\":true") && resp.contains("\"count\":6"))
  }

  test("group momentum keyed update writes only score columns") {
    val dir = Files.createTempDirectory("graft_e2e_grp")
    val wh = s"$dir/warehouse"
    val sectors = Seq(
      ("Energy", "10%", "1,000"), ("Tech", "−5%", "500"), ("Pharma", "2.5%", "250"))
      .toDF("sector", "change_pct", "market_cap")
    val scored = Orchestration.runGroupMomentum(spark, sectors, wh,
      "sector_data", "sector")
    assert(scored.columns.contains("normalized_score_3m"))
    val stored = graft.sinks.MergeByKey.readCommitted(spark, s"$wh/sector_data")
    assert(stored.count() == 3)
    assert(stored.filter($"normalized_score_3m".isNotNull).count() == 3)
  }
}
