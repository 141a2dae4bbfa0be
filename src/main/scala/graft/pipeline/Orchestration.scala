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

  /** NIGHTLY NEAR-DUP REFRESH (r17 verdict #8) — the staging chain the
    * per-query gates exercise piecewise (q179 incremental pairs, q344
    * component merge, q41 sink) wired end-to-end as the production
    * cycle the README tells:
    *
    *   1. standing band keys from (or created into) the staged key
    *      store at `stageDir` — the standing corpus is never re-signed;
    *   2. the delta batch signs only itself, joins the standing keys
    *      for candidates, cosine-verifies candidates only;
    *   3. yesterday's committed (node, component) label map merges
    *      with the delta pairs (star contraction ∪ delta — merge ==
    *      full recompute, the q344 contract). First night, with no
    *      committed map, the full standing pair surface from the
    *      staged keys feeds connectedComponents instead;
    *   4. the merged map upserts through the merge-by-key sink — the
    *      snapshot readers keep resolving while the refresh runs.
    *
    * After the refresh the batch belongs to the standing corpus;
    * the next night's caller stages keys for the grown corpus (the
    * stores are stamp-keyed, so growth forces a key re-stage while
    * the LABEL map still rides the committed table + delta merge).
    * Returns the newly committed label map. */
  def runNearDupRefresh(spark: SparkSession, standing: DataFrame,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, stageDir: String, warehouse: String,
      baseBits: Int, bands: Int, bitsPerBand: Int): DataFrame = {
    import graft.operators.{Dedup, SimilaritySearch}
    val keys = SimilaritySearch.stagedBandKeys(standing, idCol, vecCol,
      stageDir, baseBits, bands, bitsPerBand)
    val vectors = standing.unionByName(batch)
    val deltaPairs = SimilaritySearch.incrementalEmbeddingNearDup(
      keys, vectors, batch, idCol, vecCol, threshold,
      baseBits, bands, bitsPerBand)
      .select(col("id_a"), col("id_b"))
    val table = s"$warehouse/neardup_components"
    val merged = MergeByKey.committedVersion(spark, table) match {
      case Some(_) =>
        Dedup.mergeComponentMap(
          MergeByKey.readCommitted(spark, table)
            .select(col("node"), col("component")),
          deltaPairs, "id_a", "id_b")
      case None =>
        val standingPairs = SimilaritySearch.embeddingNearDupFromKeys(
          keys, standing, idCol, vecCol, threshold)
          .select(col("id_a"), col("id_b"))
        Dedup.connectedComponents(
          standingPairs.unionByName(deltaPairs), "id_a", "id_b")
    }
    MergeByKey.upsert(spark, merged, table, "node")
    MergeByKey.readCommitted(spark, table)
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
