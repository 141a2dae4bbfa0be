package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over an embedding corpus — the metric
  * surface a training-data pipeline runs after building/refreshing a
  * retrieval index: per query, hits@k, the rank of the first relevant
  * result, MRR, recall@k and nDCG@k, with relevance defined by label
  * agreement (a corpus vector is relevant to a query iff it carries
  * the query's label — the standard proxy when no human qrels exist).
  *
  * EVERY metric ships as an exact scaled integer: MRR/recall/nDCG go
  * through [[graft.functions.ExactRound.ratioScaled]], and the DCG
  * position weights 1/log2(i+1) are a PRECOMPUTED e9-scaled table
  * ([[dcgWeightsE9]], one Scala derivation shared with the oracle —
  * the decayPowersE6 pattern), so libm never runs per-row and the
  * whole surface is engine-exact.
  *
  * Shape at scale: the run comes from
  * [[SimilaritySearch.bruteForceTopKBatchRanked]] (one corpus scan
  * against the broadcast query set, two-phase top-k — no global
  * sort). Label attachment broadcasts the |Q|·k RUN into a streamed
  * scan of the corpus label projection (r13 fix: the corpus side is
  * one row per corpus vector and must never be the broadcast side);
  * only the genuinely small sides — the query labels (|Q| rows) and
  * the per-label counts (|distinct labels| rows) — broadcast. The
  * metric aggregate is per-query over k rows. At 100 TB the corpus
  * scans dominate and stay one pass regardless of |Q|.
  */
object RetrievalEval {

  /** e9-scaled DCG position weights round(1e9 / log2(i+1)), i=1..k. */
  def dcgWeightsE9(k: Int): Array[Long] =
    (1 to k).map(i =>
      Math.round(1e9 / (Math.log(i + 1.0) / Math.log(2.0)))).toArray

  /** Ideal-DCG prefix sums: idcgE9(n) = Σ_{i=1..n} w(i), n=1..k. */
  def idcgPrefixE9(k: Int): Array[Long] =
    dcgWeightsE9(k).scanLeft(0L)(_ + _).tail

  /** Per-query metrics: (query_id, n_rel_at_k, first_rel_rank,
    * rr_e6, recall_e6, dcg_e9, ndcg_e6). `first_rel_rank` is NULL
    * (and rr_e6 0) when no relevant result made the top k; recall and
    * nDCG are 0 when the corpus holds no other vector of the query's
    * label. */
  def relevanceMetrics(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "need query ids and k >= 1")
    val wArr = array(dcgWeightsE9(k).map(lit): _*)
    val idcgArr = array(idcgPrefixE9(k).map(lit): _*)
    val run = SimilaritySearch.bruteForceTopKBatchRanked(
      df, idCol, vecCol, queryIds, k)
    val labels = df.select(col(idCol).as("cid__"),
      col(labelCol).cast("long").as("c_lab"))
    val qlab = df.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("q_lab"))
    val labCounts = df
      .groupBy(col(labelCol).cast("long").as("q_lab"))
      .agg(count(lit(1)).as("n_lab"))
    // labels is corpus-sized: stream it and broadcast the |Q|·k run
    // (broadcasting the corpus label projection OOMs at real scale)
    val per = labels
      .join(broadcast(run.join(broadcast(qlab), "query_id")),
        col("cid__") === col(idCol))
      .withColumn("rel__",
        when(col("c_lab") === col("q_lab"), 1L).otherwise(0L))
      .groupBy(col("query_id"), col("q_lab"))
      .agg(sum(col("rel__")).as("n_rel_at_k"),
        min(when(col("rel__") === 1L, col("rank"))).as("first_rel_rank"),
        sum(col("rel__") *
          element_at(wArr, col("rank").cast("int"))).as("dcg_e9"))
    per
      .join(broadcast(labCounts), Seq("q_lab"), "left")
      .withColumn("n_rel_total",
        greatest(coalesce(col("n_lab"), lit(1L)) - 1L, lit(0L)))
      .select(col("query_id"),
        col("n_rel_at_k"),
        col("first_rel_rank"),
        coalesce(graft.functions.ExactRound.ratioScaled(lit(1L),
          col("first_rel_rank"), 6), lit(0L)).as("rr_e6"),
        graft.functions.ExactRound.ratioScaled(col("n_rel_at_k"),
          col("n_rel_total"), 6).as("recall_e6"),
        col("dcg_e9"),
        when(col("n_rel_total") > 0,
          graft.functions.ExactRound.ratioScaled(col("dcg_e9"),
            element_at(idcgArr,
              least(col("n_rel_total"), lit(k.toLong)).cast("int")), 6))
          .otherwise(0L).as("ndcg_e6"))
  }
}
