package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit — the privacy QA pass a dataset
  * release runs alongside PII scrubbing ([[PiiScrub]] removes direct
  * identifiers; THIS measures whether quasi-identifier combinations
  * still single people out). Per equivalence class (one distinct
  * combination of the quasi-identifier columns): its size, the number
  * of distinct sensitive values it contains, and the two standard
  * flags — `k_anonymous` (size >= k: an attacker matching the
  * quasi-identifiers finds at least k candidates) and `l_diverse`
  * (>= l distinct sensitive values: matching does not reveal the
  * sensitive attribute even within the class).
  *
  * Shape at scale: one groupBy over the quasi-identifier tuple with
  * (count, count_distinct) — the distinct turns into Spark's standard
  * two-phase Expand/partial-agg plan, map-side combinable; no windows,
  * no driver state. NULL quasi values form their own class (a null
  * zip code is itself a linkable signal). */
object PrivacyAudit {

  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("class_size"),
        col("n_sensitive"),
        (col("class_size") >= k).as("k_anonymous"),
        (col("n_sensitive") >= l).as("l_diverse")): _*)
  }
}
