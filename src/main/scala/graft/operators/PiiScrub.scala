package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and mask emails, phone
  * numbers, and IP addresses with typed placeholder tokens, reporting
  * per-doc match counts (the audit trail a compliance pass needs).
  *
  * Pure row-wise regexp projection — narrow, codegen'd, no shuffle; the
  * scan cost IS the operator cost at corpus scale.
  *
  * Rules apply IN ORDER to the progressively scrubbed text (emails
  * before phones before IPs), so a doc's counts partition its matches:
  * an email's host can contain digit runs that a later rule would
  * otherwise re-match. Each stage is staged as a column — the chained
  * regexp_replace is evaluated once per stage, not once per reference.
  *
  * Patterns live in the Java ∩ RE2 common dialect (character classes,
  * bounded repetition, no lookaround, no \b) so the same string drives
  * Spark's Java regex and an external engine's RE2 identically. Note
  * DuckDB's regexp_replace needs the 'g' flag for global replacement —
  * Spark's is always global.
  */
object PiiScrub {

  /** (name, pattern, replacement token) applied in order. */
  case class Rule(name: String, pattern: String, token: String)

  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    Rule("phone", "\\+?[0-9]{2,3}[- ][0-9]{3}[- ][0-9]{4}", "<PHONE>"),
    Rule("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** (id, text_clean, n_<rule> per rule): masked text + match counts. */
  def scrub(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be distinct")
    val start = df.select(col(idCol), col(textCol).as("t__0"))
    val staged = rules.zipWithIndex.foldLeft(start) {
      case (d, (r, i)) =>
        d.withColumn(s"n_${r.name}",
            size(regexp_extract_all(col(s"t__$i"), lit(r.pattern), lit(0)))
              .cast("long"))
          .withColumn(s"t__${i + 1}",
            regexp_replace(col(s"t__$i"), r.pattern, r.token))
    }
    staged.select(col(idCol) +: col(s"t__${rules.size}").as("text_clean") +:
      rules.map(r => col(s"n_${r.name}")): _*)
  }

  /** Corpus totals per rule — the one-line compliance summary. */
  def summary(scrubbed: DataFrame, rules: Seq[Rule] = defaultRules): DataFrame =
    scrubbed.agg(
      count(lit(1)).as("n_docs"),
      rules.map(r => sum(col(s"n_${r.name}")).as(s"total_${r.name}")) ++
        rules.map(r =>
          sum(when(col(s"n_${r.name}") > 0, 1L).otherwise(0L))
            .as(s"docs_with_${r.name}")): _*)
}
