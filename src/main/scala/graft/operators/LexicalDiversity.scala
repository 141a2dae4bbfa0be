package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{ExactRound, TextFns}

/** Per-source LEXICAL DIVERSITY card — the "is this slice repetitive
  * boilerplate or varied text?" gauge a corpus audit runs before
  * mixing weights are chosen. Entropy-family metrics are the
  * textbook choice but need `ln` (libm-dependent, gate-hostile);
  * every number here is a RATIONAL with the same ordering power:
  *
  *  - Gini–Simpson index 1 − Σp², p = c_w/C — the probability two
  *    random tokens differ; 0 = one token repeated, →1 = diverse.
  *    (Σc², C² run in DECIMAL(38,0): c² crosses long range once a
  *    source holds ~3e9 repeats of one token.)
  *  - type–token ratio V/C, hapax share |{c=1}|/V (Zipf tail mass),
  *    and top-k token mass Σ_{top k}c/C (head concentration).
  *
  * Shape at scale: ONE token shuffle to (source, word) counts; the
  * card is a map-side-combinable re-aggregate of that table; the
  * top-k mass rides [[RankOps.groupTopK]]'s rank-limit window
  * (WindowGroupLimit map-side heaps — never a full per-source sort
  * at the reducer). No per-doc state, no driver collects. */
object LexicalDiversity {

  /** (source, n_docs, n_tokens, vocab, ttr_e6, gini_simpson_e6,
    * hapax_e6, topk_mass_e6); empty-string tokens from blank docs
    * count like any other (TextFns.words('') = [''], mirrored by the
    * oracle's string_split). Zero-token sources emit all-zero ratios
    * (the ExactRound den-0 convention). */
  def perSource(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK >= 1")
    def d(c: Column) = c.cast("decimal(38,0)")
    val wc = df
      .select(col(sourceCol), explode(TextFns.words(col(textCol))).as("w"))
      .groupBy(col(sourceCol), col("w"))
      .agg(count(lit(1)).as("c__"))
    val per = wc.groupBy(col(sourceCol))
      .agg(sum(col("c__")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(d(col("c__")) * d(col("c__"))).as("sumsq__"),
        sum(when(col("c__") === 1L, 1L).otherwise(0L)).as("hapax__"))
    val top = RankOps.groupTopK(wc, Seq(sourceCol), topK,
        col("c__"), Seq(col("w")))
      .groupBy(col(sourceCol)).agg(sum(col("c__")).as("topc__"))
    df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .join(per, Seq(sourceCol)).join(top, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("vocab"),
        ExactRound.ratioScaled(col("vocab"), col("n_tokens"), 6)
          .as("ttr_e6"),
        ExactRound.ratioScaledBig(
          d(col("n_tokens")) * d(col("n_tokens")) - col("sumsq__"),
          d(col("n_tokens")) * d(col("n_tokens")), 6)
          .as("gini_simpson_e6"),
        ExactRound.ratioScaled(col("hapax__"), col("vocab"), 6)
          .as("hapax_e6"),
        ExactRound.ratioScaled(col("topc__"), col("n_tokens"), 6)
          .as("topk_mass_e6"))
  }

  /** The DuckDB mirror: same token split, same HUGEINT products,
    * same (count desc, word asc) top-k order. */
  def perSourceSql(table: String, source: String, wordsExpr: String,
      topK: Int = 10): String = {
    val rs = ExactRound
    s"""WITH t AS (SELECT $source AS src, unnest($wordsExpr) AS w
       |  FROM $table),
       |wc AS (SELECT src, w, count(*) AS c FROM t GROUP BY 1, 2),
       |per AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    count(*) AS vocab, sum(CAST(c AS HUGEINT) * c) AS sumsq,
       |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax
       |  FROM wc GROUP BY 1),
       |tp AS (SELECT src, CAST(sum(c) AS BIGINT) AS topc
       |  FROM (SELECT src, c, row_number() OVER (
       |      PARTITION BY src ORDER BY c DESC, w ASC) AS rnk FROM wc)
       |  WHERE rnk <= $topK GROUP BY 1),
       |dd AS (SELECT $source AS src, count(*) AS n_docs
       |  FROM $table GROUP BY 1)
       |SELECT src AS $source, n_docs, n_tokens, vocab,
       |  ${rs.ratioScaledSql("vocab", "n_tokens", 6)} AS ttr_e6,
       |  ${rs.ratioScaledSql(
             "CAST(n_tokens AS HUGEINT) * n_tokens - sumsq",
             "CAST(n_tokens AS HUGEINT) * n_tokens", 6)}
       |    AS gini_simpson_e6,
       |  ${rs.ratioScaledSql("hapax", "vocab", 6)} AS hapax_e6,
       |  ${rs.ratioScaledSql("topc", "n_tokens", 6)} AS topk_mass_e6
       |FROM dd JOIN per USING (src) JOIN tp USING (src)""".stripMargin
  }
}
