package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID, fingerprinting. Pure expression
  * pipelines — narrow, no shuffle, codegen'd end to end.
  */
object TextAnalysis {

  /** Token counts: whitespace words + BPE-ish regex tokens. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(TextFns.words(col(textCol))).cast("long").as("n_words"),
      size(TextFns.regexTokens(col(textCol))).cast("long").as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars_obs"))

  /** Stopword markers per language for the n-gram-free heuristic
    * language-ID below. Tiny inline profiles; at scale these would be the
    * top-k character n-grams per language, but the operator shape —
    * argmax over per-language marker hit counts — is identical. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "le", "shi"))

  private def markerHits(wordsArr: Column, markers: Seq[String]): Column =
    size(filter(wordsArr, w => markers.map(m => w === m).reduce(_ || _)))

  /** Language-ID: argmax of marker hit-rate, alphabetical-first tie-break,
    * 'und' (undetermined) when no marker hits at all. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextFns.words(col(textCol))
    val hits = langMarkers.map { case (lang, ms) => lang -> markerHits(w, ms) }
    // argmax with alphabetical-first tie-break: langMarkers is sorted, and
    // a when-chain takes the FIRST branch that matches the max.
    val maxHits = greatest(hits.map(_._2): _*)
    val pred = hits.foldRight(lit("und")) { case ((lang, cnt), acc) =>
      when(maxHits > 0 && cnt === maxHits, lit(lang)).otherwise(acc)
    }
    df.select(col(idCol), pred.as("pred_lang"))
  }

  /** Quality scoring (length / punctuation / stopword signals), one
    * deterministic 0-1 score per doc. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = TextFns.words(t)
    val nWords = size(w).cast("double")
    val stop = Seq("the", "a", "of", "to", "and")
    val stopHits = markerHits(w, stop).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[^a-z0-9\\s]", ""))).cast("double")
    val avgWordLen = (length(regexp_replace(t, "\\s+", "")).cast("double") / nWords)
    val lenScore = least(nWords / lit(100.0), lit(1.0))
    val stopRatio = stopHits / nWords
    val punctRatio = punct / length(t).cast("double")
    val score = lenScore * (lit(1.0) - punctRatio) *
      (lit(0.5) + lit(0.5) * least(stopRatio * 5.0, lit(1.0)))
    df.select(col(idCol),
      size(w).cast("long").as("n_words"),
      round(avgWordLen, 4).as("avg_word_len"),
      round(stopRatio, 4).as("stop_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(score, 4).as("quality"))
  }

  /** Rolling-hash-style document fingerprint + surrogate key. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      TextFns.fingerprint(col(textCol)).as("fp"),
      graft.functions.Cleanse.surrogateKey(col(textCol)).as("skey"))
}
