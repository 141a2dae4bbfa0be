package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Corpus vocabulary construction — the token-frequency table a
  * tokenizer-training or feature-extraction pass starts from: for each
  * token, its collection frequency (total occurrences), document
  * frequency (docs containing it), and rank by collection frequency.
  *
  * Aggregation is two-level, the same map-side-combinable shape as
  * [[TextAnalysis.repetitionSignals]]: groupBy(doc, token) counts
  * per-doc occurrences (partials combine within every input task), then
  * groupBy(token) sums occurrences and counts rows — giving cf and df
  * in ONE pass without `countDistinct`'s expand. Top-k selection is
  * orderBy().limit(k): Spark plans TakeOrderedAndProject — every task
  * forwards its own k candidates, no global sort, no single-partition
  * window. The rank window AFTER the limit runs over ≤ k rows by
  * construction (driver-bounded, same contract as a collected sketch).
  *
  * Ties rank deterministically by (cf desc, token asc) in both the
  * selection and the rank — reruns and engines agree on the full row
  * set including the boundary. */
object VocabBuild {

  def topTokens(docs: DataFrame, idCol: String, textCol: String,
      topK: Int, minDocFreq: Long = 1L): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val perDoc = docs
      .select(col(idCol).as("doc"),
        explode(TextFns.words(col(textCol))).as("token"))
      .groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val vocab = perDoc
      .groupBy(col("token"))
      .agg(sum(col("tf")).as("coll_freq"), count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
    val top = vocab
      .orderBy(col("coll_freq").desc, col("token").asc)
      .limit(topK)
    top.withColumn("rank",
      row_number().over(
        Window.orderBy(col("coll_freq").desc, col("token").asc)))
  }
}
