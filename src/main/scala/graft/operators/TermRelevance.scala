package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** BM25-family term relevance over a document corpus: score every
  * document against a (small) query term set, with corpus statistics
  * (doc frequency, average length) computed in the same job.
  *
  * Two scale-shape decisions:
  *   - tf comes from ONE explode + conditional aggregate per term
  *     (map-side combinable, linear shuffle on doc id) — not per-doc
  *     array lambdas, which are interpreted and re-evaluated per
  *     reference;
  *   - corpus stats (N, Σlen, df per term) reduce to a single row that
  *     broadcast-cross-joins back — query term sets are small by
  *     definition, so the stats row is a handful of longs.
  *
  * Exactness: the per-term weight is the RATIONAL Robertson/Spärck-
  * Jones idf, (N - df + 0.5)/(df + 0.5), NOT its logarithm — ln is a
  * transcendental with no cross-engine correct-rounding guarantee,
  * while +,-,*,/ are IEEE-exact, so this variant reproduces
  * bit-identically in the SQL oracle. The log is a monotone per-term
  * shrink; swapping `idf` for `log(idf)` changes relative term
  * emphasis but not the operator's shape — callers wanting classical
  * BM25 weighting pass `logIdf = true` and accept engine-level float
  * drift in the last ulp. Score terms sum in FIXED term order
  * (left-associative fold), the same discipline as the z-score
  * pipeline: a groupBy double sum over terms would be
  * partial-order-dependent.
  */
object TermRelevance {

  /** Per-doc BM25 scores for `terms`: (id, doc_len, n_hit_terms,
    * score). Only documents containing at least one query term are
    * returned (a zero score carries no ranking signal and at corpus
    * scale the miss set is nearly everything). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    require(terms.distinct == terms, "terms must be distinct")
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id__"),
        explode(TextFns.words(col(textCol))).as("w__"))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w__") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val perDoc = toks.groupBy(col("id__"))
      .agg(count(lit(1)).as("dl"), tfAggs: _*)
    val statAggs = count(lit(1)).as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val joined = perDoc.crossJoin(broadcast(stats))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    // per-doc length normalization, staged once: (1 - b) + b*dl/avgdl
    val norm = lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl
    def contrib(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val dfT = col(s"df$i").cast("double")
      val rawIdf = (nD - dfT + lit(0.5)) / (dfT + lit(0.5))
      val idf = if (logIdf) log(rawIdf + lit(1.0)) else rawIdf
      idf * (tf * lit(k1 + 1.0) / (tf + lit(k1) * norm))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    val anyHit = terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0
    val nHits = terms.indices.map(i =>
      when(col(s"tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    joined.filter(anyHit)
      .select(col("id__").as(idCol), col("dl").as("doc_len"),
        nHits.as("n_hit_terms"), round(score, 4).as("score"))
  }
}
