package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.functions.Cleanse

/** S1/P1-P4 — screener-CSV ingestion (SURVEY.md §2.1-2.2).
  *
  * Reads a header CSV, applies the reference's header→snake_case rename
  * map keeping only mapped columns that are PRESENT (the reference selects
  * the intersection, uploadtodb.py:147-151 — unmapped-column tolerance),
  * cleanses values (P2), stamps the load time (F9), and drops rows with a
  * blank key (P3). All of it is one `select` projection over one scan —
  * Catalyst prunes unneeded CSV columns at parse time.
  */
object CsvIngest {

  /** uploadtodb.py:74-124 — technical screener header map (47 pairs). */
  val technicalMap: Seq[(String, String)] = Seq(
    "Symbol" -> "symbol",
    "Description" -> "description",
    "Technical Rating 1 day" -> "technical_rating_1_day",
    "Moving Averages Rating 1 day" -> "moving_averages_rating_1_day",
    "Oscillators Rating 1 day" -> "oscillators_rating_1_day",
    "Relative Strength Index (14) 1 day" -> "rsi_14_1_day",
    "Momentum (10) 1 day" -> "momentum_10_1_day",
    "Awesome Oscillator 1 day" -> "awesome_oscillator_1_day",
    "Commodity Channel Index (20) 1 day" -> "cci_20_1_day",
    "Stochastic (14,3,3) 1 day, %K" -> "stochastic_k_14_3_3_1_day",
    "Stochastic (14,3,3) 1 day, %D" -> "stochastic_d_14_3_3_1_day",
    "Candlestick Pattern 1 day" -> "candlestick_pattern_1_day",
    "Rate of Change (9) 1 day" -> "roc_9_1_day",
    "Moving Average Convergence Divergence (12,26) 1 day, Level" -> "macd_12_26_level_1_day",
    "Moving Average Convergence Divergence (12,26) 1 day, Signal" -> "macd_12_26_signal_1_day",
    "Average Directional Index (14) 1 day" -> "adx_14_1_day",
    "Ultimate Oscillator (7,14,28) 1 day" -> "ultimate_oscillator_7_14_28_1_day",
    "Technical Rating 1 week" -> "technical_rating_1_week",
    "Sector" -> "sector",
    "Industry" -> "industry",
    "Analyst Rating" -> "analyst_rating",
    "Performance % Year to date" -> "performance_ytd",
    "Performance % 1 year" -> "performance_1_year",
    "Performance % 6 months" -> "performance_6_months",
    "Performance % 3 months" -> "performance_3_months",
    "Performance % 1 month" -> "performance_1_month",
    "Performance % 1 week" -> "performance_1_week",
    "Target price 1 year" -> "target_price_1_year",
    "Target price 1 year - Currency" -> "target_price_1_year_currency",
    "Target price performance % 1 year" -> "target_price_performance_1_year",
    "Price" -> "price",
    "Price - Currency" -> "price_currency",
    "Simple Moving Average (50) 1 day" -> "sma_50_1_day",
    "Simple Moving Average (200) 1 day" -> "sma_200_1_day",
    "Bollinger Bands (20) 1 day, Upper" -> "bollinger_upper_20_1_day",
    "Bollinger Bands (20) 1 day, Basis" -> "bollinger_basis_20_1_day",
    "Bollinger Bands (20) 1 day, Lower" -> "bollinger_lower_20_1_day",
    "Williams Percent Range (14) 1 day" -> "williams_percent_range_14_1_day",
    "Moving Average Convergence Divergence (12,26) 1 day, Level.1" -> "macd_12_26_level_1_day_2",
    "Moving Average Convergence Divergence (12,26) 1 day, Signal.1" -> "macd_12_26_signal_1_day_2",
    "Chaikin Money Flow (20) 1 day" -> "chaikin_money_flow_20_1_day",
    "Chaikin Money Flow (20) 1 week" -> "chaikin_money_flow_20_1_week",
    "Chaikin Money Flow (20) 1 month" -> "chaikin_money_flow_20_1_month",
    "Market capitalization" -> "market_capitalization",
    "Market capitalization - Currency" -> "market_capitalization_currency",
    "Beta 1 year" -> "beta_1_year",
    "Volatility 1 month" -> "volatility_1_month",
    "Volatility 1 week" -> "volatility_1w",
    "Index" -> "index_memberships")

  /** funda_uploadtodb.py:60-111 — fundamental screener header map
    * (51 pairs; note the reference's real gap: no 'Net margin %, TTM'
    * column exists in the export, so `net_margin_ttm` stays 0% covered).
    */
  val fundamentalMap: Seq[(String, String)] = Seq(
    "Symbol" -> "symbol",
    "Description" -> "description",
    "Price" -> "price",
    "Price - Currency" -> "price_currency",
    "Market capitalization" -> "market_capitalization",
    "Market capitalization - Currency" -> "market_capitalization_currency",
    "Sector" -> "sector",
    "Industry" -> "industry",
    "Analyst Rating" -> "analyst_rating",
    "Price to earnings ratio" -> "pe_ratio",
    "Price to book ratio" -> "price_to_book_ratio",
    "Price to sales ratio" -> "price_to_sales_ratio",
    "Price to earning to growth, Trailing 12 months" -> "price_to_earnings_growth_ttm",
    "Price to cash flow ratio" -> "price_to_free_cash_flow_ratio",
    "Enterprise value" -> "enterprise_value",
    "Enterprise value to revenue ratio, Trailing 12 months" -> "enterprise_value_to_revenue_ttm",
    "Enterprise value to EBITDA ratio, Trailing 12 months" -> "enterprise_value_to_ebitda_ttm",
    "Return on equity %, Trailing 12 months" -> "return_on_equity_ttm",
    "Return on assets %, Trailing 12 months" -> "return_on_assets_ttm",
    "Return on invested capital %, Trailing 12 months" -> "return_on_invested_capital_ttm",
    "Gross margin %, Annual" -> "gross_margin_annual",
    "Operating margin %, Annual" -> "operating_margin_ttm",
    "Net margin %, Trailing 12 months" -> "net_margin_ttm",
    "Earnings per share diluted, Trailing 12 months" -> "eps_diluted_ttm",
    "Earnings per share basic, Trailing 12 months" -> "basic_eps_ttm",
    "Earnings per share diluted growth %, TTM YoY" -> "eps_diluted_growth_ttm_yoy",
    "Earnings per share diluted growth %, Annual YoY" -> "eps_diluted_growth_annual_yoy",
    "Earnings per share diluted growth %, Quarterly YoY" -> "eps_diluted_growth_quarterly_yoy",
    "Earnings per share diluted growth %, Quarterly QoQ" -> "eps_diluted_growth_quarterly_qoq",
    "Earnings per share estimate, Quarterly" -> "eps_forecast_quarterly",
    "Total revenue, Annual" -> "total_revenue_annual",
    "Net income, Annual" -> "net_income_annual",
    "Net income, Trailing 12 months" -> "net_income_ttm",
    "EBITDA, Trailing 12 months" -> "ebitda_ttm",
    "Revenue growth %, Annual YoY" -> "revenue_growth_annual_yoy",
    "Revenue growth %, Quarterly YoY" -> "revenue_growth_quarterly_yoy",
    "Revenue growth %, Quarterly QoQ" -> "revenue_growth_quarterly_qoq",
    "Net income growth %, Annual YoY" -> "net_income_growth_annual_yoy",
    "Free cash flow, Annual" -> "free_cash_flow_annual",
    "Operating cash flow per share, Trailing 12 months" -> "cash_from_operating_activities_ttm",
    "Total debt, Quarterly" -> "total_debt_quarterly",
    "Debt to equity ratio, Quarterly" -> "debt_to_equity_ratio_quarterly",
    "Debt to EBITDA ratio, Annual" -> "debt_to_ebitda_ratio_annual",
    "Interest coverage, Trailing 12 months" -> "ebitda_interest_coverage_ttm",
    "Current ratio, Quarterly" -> "current_ratio_quarterly",
    "Quick ratio, Quarterly" -> "quick_ratio_quarterly",
    "Dividend yield %, Trailing 12 months" -> "dividend_yield_ttm",
    "Cash & equivalents, Annual" -> "cash_and_equivalents_annual",
    "Total common shares outstanding" -> "shares_outstanding",
    "Free float %" -> "float_percent")

  /** Columns that stay strings after the rename; everything else is
    * numeric and runs through `clean_value` (P2). */
  private val stringCols = Set("symbol", "description", "sector", "industry",
    "analyst_rating", "technical_rating_1_day", "moving_averages_rating_1_day",
    "oscillators_rating_1_day", "technical_rating_1_week",
    "candlestick_pattern_1_day", "price_currency",
    "target_price_1_year_currency", "market_capitalization_currency",
    "index_memberships")

  /** Read a screener CSV (S1): header on, explicit separator, permissive
    * (malformed rows -> nulls, like pandas' coercion). */
  def readCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** P1 + P2 + F9: rename-map projection keeping the intersection of the
    * map and the actual header, with per-type cleansing. `stampTime`
    * overrides the F9 load-time stamp with a fixed clock — the oracle
    * gate needs a deterministic stamp; production callers leave the
    * default wall clock. */
  def canonicalize(raw: DataFrame, mapping: Seq[(String, String)],
      keyCol: String = "symbol",
      stampTime: Option[Column] = None): DataFrame = {
    val present = mapping.filter { case (src, _) => raw.columns.contains(src) }
    val cols: Seq[Column] = present.map { case (src, dst) =>
      val c = col(s"`$src`")
      val cleaned =
        if (stringCols.contains(dst)) Cleanse.nullifEmpty(c)
        else if (dst == "shares_outstanding")
          Cleanse.cleanNumber(c).cast("long") // funda_uploadtodb.py:118-127
        else Cleanse.cleanDouble(Cleanse.cleanNumber(c))
      cleaned.as(dst)
    }
    raw.select(cols: _*)
      .filter(Cleanse.validKey(col(keyCol)))
      .withColumn("last_modified_date",
        stampTime.getOrElse(current_timestamp()))
  }

  /** P4 — scrape-noise predicate on a name column
    * (sectormerged_improved.py:343-353): reasonable length, not a header
    * echo, date, or analysis row. */
  def scrapeNoiseFilter(name: Column, maxLen: Int = 50): Column =
    name.isNotNull &&
      length(name) <= maxLen &&
      !name.contains("Sector") &&
      !name.contains("0001-01-01") &&
      !name.contains("Strengths:") &&
      !name.contains("Neutral") &&
      length(trim(name)) > 0 &&
      !name.rlike("^\\d{4}-\\d{2}-\\d{2}")
}
