package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.serve.Screeners
import graft.sources.CsvIngest

/** The §2.11/§3.4 lifecycle wired END TO END in one entry: raw screener
  * CSV → canonical `stock_data` frame (S1 scan + P1 rename + P2/P3
  * cleanse) → composite scoring (the §3.1 pipeline) → named-screener
  * top-k → the reference's `ScreenerResponse` JSON envelope.
  *
  * This is the full path the reference runs as cron (downloader →
  * uploadtodb.py → calcompositescore.py) plus serve
  * (`tradingview_api_server` bytecode): one declarative plan from file
  * to envelope, collecting ONLY the final top-k rows. Each stage is
  * independently gated elsewhere (CsvIngestSpec, PipelineSpec,
  * ScreenersSpec); ServingPipelineSpec asserts the composition.
  */
object ServingPipeline {

  /** CSV → canonical frame → composite scores. The scored frame a
    * serving deployment keeps hot (or writes back via the merge sink)
    * while envelopes are answered per request. */
  def scoreFromCsv(spark: SparkSession, csvPath: String,
      sep: String = ","): DataFrame =
    CompositeScorePipeline(
      CsvIngest.canonicalize(
        CsvIngest.readCsv(spark, csvPath, sep), CsvIngest.technicalMap))

  /** One-call lifecycle: the named screener's JSON envelope straight
    * from a raw technical CSV. */
  def respondFromCsv(spark: SparkSession, csvPath: String,
      screener: String, sep: String = ","): String =
    Screeners.respond(spark, screener, scoreFromCsv(spark, csvPath, sep))
}
