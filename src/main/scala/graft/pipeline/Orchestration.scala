package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.MergeByKey
import graft.sources.CsvIngest

/** End-to-end pipeline drivers mirroring the reference's cron entry
  * points (SURVEY §3.1-3.3), with the subprocess boundaries collapsed
  * into one Spark plan per stage and the REST upserts replaced by the
  * merge-by-key parquet sink. A reference user's daily/weekly flows map
  * 1:1 onto these calls.
  */
object Orchestration {

  /** §3.1 daily technical flow: newest technical CSV → canonicalize →
    * upsert into stock_data → composite scores → upsert into
    * stock_rankings. Returns the scored frame. */
  def runTechnical(spark: SparkSession, csvGlob: String,
      warehouse: String): Option[DataFrame] =
    graft.Tables.latestByMtime(spark, csvGlob).map { path =>
      val canonical = CsvIngest.canonicalize(
        CsvIngest.readCsv(spark, path), CsvIngest.technicalMap)
      MergeByKey.upsert(spark, canonical, s"$warehouse/stock_data", "symbol")
      val scored = CompositeScorePipeline(
        MergeByKey.readCommitted(spark, s"$warehouse/stock_data"))
      val rankings = scored.select(col("symbol"), col("market_cap_category"),
        col("composite_score"), current_timestamp().as("update_date"))
      MergeByKey.upsert(spark, rankings, s"$warehouse/stock_rankings", "symbol")
      scored
    }

  /** §3.2 weekly fundamental flow: fundamental CSV → canonicalize →
    * upsert into the SAME stock_data (columns merge by symbol) →
    * percentile scores + ranks → upsert score columns. */
  def runFundamental(spark: SparkSession, csvGlob: String,
      warehouse: String): Option[DataFrame] =
    graft.Tables.latestByMtime(spark, csvGlob).map { path =>
      val canonical = CsvIngest.canonicalize(
        CsvIngest.readCsv(spark, path), CsvIngest.fundamentalMap)
      MergeByKey.upsert(spark, canonical, s"$warehouse/stock_data", "symbol")
      val stock = MergeByKey.readCommitted(spark, s"$warehouse/stock_data")
      val scored = FundamentalScorePipeline(stock)
      val withCats = scored.join(
        MergeByKey.readCommitted(spark, s"$warehouse/stock_rankings")
          .select(col("symbol"), col("market_cap_category")),
        Seq("symbol"), "left")
      val ranked = FundamentalScorePipeline.withRanks(withCats)
      val scoreCols = Seq("symbol", "fundamental_score", "quality_score",
        "growth_score", "valuation_score", "health_score", "fundamental_rank")
      MergeByKey.upsert(spark,
        ranked.select(scoreCols.map(col): _*)
          .withColumn("fundamental_update_date", current_timestamp()),
        s"$warehouse/stock_rankings", "symbol")
      ranked
    }

  /** §3.3 sector/industry momentum flow: merged group table → parse +
    * min-max + 3-horizon scores → keyed update of the score columns
    * only (S9). */
  def runGroupMomentum(spark: SparkSession, groupTable: DataFrame,
      warehouse: String, tableName: String, keyCol: String): DataFrame = {
    val scored = GroupMomentumPipeline(groupTable)
      .withColumn("updated_at", current_timestamp())
    MergeByKey.upsert(spark, scored, s"$warehouse/$tableName", keyCol,
      overwriteColumns = Some(Seq("normalized_score_3m", "normalized_score_6m",
        "normalized_score_1y", "updated_at")))
    scored
  }
}
