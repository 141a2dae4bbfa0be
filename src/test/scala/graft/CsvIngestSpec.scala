package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.CsvIngest
import graft.serve.Screeners

class CsvIngestSpec extends SparkSpec {
  import spark.implicits._

  test("S1/P1/P2: csv read, rename-map intersection, per-type cleansing, key filter") {
    val dir = Files.createTempDirectory("graft_csv")
    val csv = Seq(
      "Symbol,Description,Price,Relative Strength Index (14) 1 day,Sector,Unmapped Col",
      "RELIANCE,Reliance Industries,2500.5,61.25,Energy,junk",
      "TCS,  ,3500.0,55.5,IT,junk",
      ",missing key,1.0,2.0,X,junk",
      "INFY,Infosys,1500.123,abc,IT,junk").mkString("\n")
    val p = dir.resolve("Technicals_test.csv")
    Files.writeString(p, csv)
    val raw = CsvIngest.readCsv(spark, p.toString)
    val out = CsvIngest.canonicalize(raw, CsvIngest.technicalMap)
    assert(out.columns.toSeq == Seq("symbol", "description", "rsi_14_1_day",
      "sector", "price", "last_modified_date"))
    val rows = out.select($"symbol", $"description", $"price", $"rsi_14_1_day")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows.size == 3) // blank-key row dropped
    assert(rows("RELIANCE") == ((Some("Reliance Industries"), Some(2500.5), Some(61.25))))
    assert(rows("TCS")._1 == None)            // whitespace description -> null
    assert(rows("INFY")._2 == Some(1500.12))  // rounded 2dp
    assert(rows("INFY")._3 == None)           // garbage numeric -> null
  }

  test("schema drift: unknown extra column dropped AND missing mapped column tolerated") {
    // Mirrors the reference's intersection select (uploadtodb.py:147-151):
    // a CSV drop that grew a new unmapped column and lost a mapped one
    // ('Sector', 'Price') must still load — unmapped silently dropped,
    // missing mapped simply absent from the output, no error, row count
    // and surviving columns unaffected.
    val dir = Files.createTempDirectory("graft_csv_drift")
    val csv = Seq(
      "Symbol,Description,Relative Strength Index (14) 1 day,Brand New Col",
      "RELIANCE,Reliance Industries,61.25,surprise",
      "TCS,Tata Consultancy,55.5,surprise").mkString("\n")
    val p = dir.resolve("Technicals_drift.csv")
    Files.writeString(p, csv)
    val out = CsvIngest.canonicalize(
      CsvIngest.readCsv(spark, p.toString), CsvIngest.technicalMap)
    // intersection only, in map order; neither the unknown column nor the
    // missing mapped ones ('sector', 'price') appear
    assert(out.columns.toSeq ==
      Seq("symbol", "description", "rsi_14_1_day", "last_modified_date"))
    assert(out.count() == 2)
    assert(out.filter($"rsi_14_1_day" === 61.25).count() == 1)

    // degenerate drift: ONLY the key column survives the intersection
    val p2 = dir.resolve("Technicals_keyonly.csv")
    Files.writeString(p2, "Symbol,Mystery\nINFY,x\n,y")
    val keyOnly = CsvIngest.canonicalize(
      CsvIngest.readCsv(spark, p2.toString), CsvIngest.technicalMap)
    assert(keyOnly.columns.toSeq == Seq("symbol", "last_modified_date"))
    assert(keyOnly.select($"symbol").collect().map(_.getString(0)).toSeq == Seq("INFY"))
  }

  test("latest-file-by-mtime resolution (S2)") {
    val dir = Files.createTempDirectory("graft_latest")
    Files.writeString(dir.resolve("Technicals_a.csv"), "Symbol\nX")
    Thread.sleep(1100) // fs mtime granularity
    Files.writeString(dir.resolve("Technicals_b.csv"), "Symbol\nY")
    val latest = Tables.latestByMtime(spark, dir.toString + "/Technicals_*.csv")
    assert(latest.exists(_.endsWith("Technicals_b.csv")))
  }

  test("P4 scrape-noise filter") {
    val df = Seq("Energy", "Sector", "0001-01-01 something", "Strengths: x",
      "Neutral outlook", "2024-01-05 rest", "  ", "x" * 60, "Utilities")
      .toDF("name")
    val kept = df.filter(CsvIngest.scrapeNoiseFilter($"name"))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("Energy", "Utilities"))
  }

  test("S11/§2.11: screener registry + JSON envelope") {
    val scored = Seq(
      ("AAA", "Large Cap", 9.5, 80.0), ("BBB", "Micro Cap", 8.0, 90.0),
      ("CCC", "Mid Cap", 7.0, 70.0)
    ).toDF("symbol", "market_cap_category", "composite_score", "fundamental_score")
    val swing = Screeners.run("swing", scored).select($"symbol").rowsSet
    assert(swing == Set(Seq("AAA"), Seq("CCC"))) // micro cap excluded
    val resp = Screeners.respond(spark, "position", scored)
    assert(resp.contains("\"success\":true") && resp.contains("\"count\":3")
      && resp.contains("\"screener_type\":\"position\"") && resp.contains("\"BBB\""))
  }
}
