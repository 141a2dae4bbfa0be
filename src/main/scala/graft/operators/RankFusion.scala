package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Reciprocal-rank fusion (RRF, Cormack et al.) — combine N
  * independently-produced rankings of the same id space into one
  * fused ordering: score(id) = Σᵢ 1/(k + rankᵢ(id)), ids missing from
  * a ranking contribute nothing from it. The retrieval-ensemble
  * primitive (BM25 ⊕ dense cosine is the canonical pair), equally the
  * multi-signal data-curation merge (quality rank ⊕ freshness rank ⊕
  * novelty rank). Each term is e6-scaled through the exact rounding
  * identity and the sum of exactly-rounded terms IS the gate surface
  * — deterministic across engines, no floats.
  *
  * Shape at scale: one full-outer reduce-join chain over the rankings
  * on the id (each ranking is (id, rank) — already reduced, typically
  * top-n sized), then a TakeOrdered top-k of the fused scores. The
  * rank columns themselves should come from a scalable ranker
  * ([[BudgetSelect.runningTotal]] with cost 1, or
  * [[ScalableRank.groupRowNumber]]) — never a single-task global
  * window; the q134 gate builds both inputs that way. */
object RankFusion {

  /** Fuse rankings (each a DataFrame with `idCol` and a long `rank`
    * column, rank 1 = best) into (id, rank_1..rank_N, rrf_e6), top
    * `topN` by (rrf_e6 desc, id asc). */
  def reciprocalRankFusion(rankings: Seq[DataFrame], idCol: String,
      k: Int = 60, topN: Int = 100): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col("rank").as(s"rank_${i + 1}"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices.map { i =>
      val r = col(s"rank_${i + 1}")
      when(r.isNotNull,
        ExactRound.ratioScaled(lit(1L), r + k.toLong, 6)).otherwise(0L)
    }.reduce(_ + _)
    RankOps.topK(joined.withColumn("rrf_e6", score), topN,
      col("rrf_e6"), col(idCol))
  }
}
