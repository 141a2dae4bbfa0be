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

  /** Per-document out-of-vocabulary rate against a vocabulary table
    * (typically [[topTokens]]' output) — the tokenizer-coverage metric
    * a vocab or tokenizer choice is judged by, and the routing signal
    * multilingual pipelines cut on (a doc mostly OOV against an
    * English vocab isn't English). Output: (id, n_tokens, n_oov,
    * oov_e4 — exact scaled ratio).
    *
    * Scale shape: the vocab side BROADCASTS (top-k output is
    * driver-bounded by construction); token membership is one
    * broadcast left join on the exploded stream; per-doc stats are one
    * map-side-combinable groupBy. */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, tokenCol: String = "token"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextFns.words(col(textCol))).as("token"))
    val flagged = toks.join(
      broadcast(vocab.select(col(tokenCol).as("token"), lit(1L).as("iv__"))
        .distinct()),
      Seq("token"), "left")
    val per = flagged.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv__").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol).as("doc")).join(per, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        graft.functions.ExactRound.ratioScaled(coalesce(col("n_oov"),
          lit(0L)), col("n_tokens"), 4).as("oov_e4"))
  }

  /** Heaps-law vocabulary growth curve — distinct-word counts at
    * nested subcorpora of 1/8, 1/4, 1/2, and all docs: the evidence
    * behind "how much new vocabulary does 10× more data buy?" when
    * sizing a tokenizer. Subcorpus membership is the md5-prefix rule
    * of [[Sampling.hashSample]] (thresholds 0x20/0x40/0x80), so the
    * levels NEST — the 1/8 sample is inside the 1/4 sample — and the
    * curve is monotone by construction. Per level: cumulative docs,
    * tokens, and vocabulary (words whose FIRST level of appearance is
    * ≤ this level).
    *
    * Shape at scale: ONE corpus explode feeding a per-word min-level
    * aggregate (map-side combinable) — never a rescan per level; the
    * cumulative windows run over the literal 4-row level frame. */
  def vocabGrowth(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val hp = substring(md5(col(idCol).cast("string")), 1, 2)
    val level = when(hp < "20", 0L).when(hp < "40", 1L)
      .when(hp < "80", 2L).otherwise(3L)
    val staged = graft.Caches.register(docs
      .select(level.as("lvl__"), TextFns.words(col(textCol)).as("ws__"))
      .persist())
    val perDoc = staged
      .select(col("lvl__"), size(col("ws__")).cast("long").as("nt__"))
      .groupBy(col("lvl__"))
      .agg(count(lit(1)).as("d__"), sum(col("nt__")).as("t__"))
    val perLevelVocab = staged
      .select(col("lvl__"), explode(col("ws__")).as("w__"))
      .groupBy(col("w__")).agg(min(col("lvl__")).as("lvl__"))
      .groupBy(col("lvl__")).agg(count(lit(1)).as("v__"))
    val run = Window.orderBy(col("level"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(4).select(col("id").as("level"))
      .join(perDoc.withColumnRenamed("lvl__", "level"), Seq("level"),
        "left")
      .join(perLevelVocab.withColumnRenamed("lvl__", "level"),
        Seq("level"), "left")
      .select(col("level"),
        sum(coalesce(col("d__"), lit(0L))).over(run).as("n_docs"),
        sum(coalesce(col("t__"), lit(0L))).over(run).as("n_tokens"),
        sum(coalesce(col("v__"), lit(0L))).over(run).as("vocab"))
  }

  /** Per-source OUT-OF-VOCABULARY exposure against the corpus-global
    * top-`vocabSize` word vocabulary — the "how much of this source
    * would a fixed vocab tokenizer shatter?" card (the coverage check
    * run before freezing any vocabulary; a high-OOV source is either
    * rich or broken, and either way needs a look). Per source: token
    * occurrences and distinct types outside the vocab, with exact e6
    * rates. Vocabulary membership is deterministic: top by
    * (count DESC, word ASC) — the same total order both engines rank.
    *
    * Shape at scale: one (source, word) count aggregate (map-side
    * combinable; the explode is the only corpus-sized pass), a global
    * word rollup of THAT table (types, not tokens), the top-k via
    * orderBy+limit (TakeOrderedAndProject — a distributed partial
    * top-k, never a global window), and a BROADCAST vocab join. */
  def oovRate(docs: DataFrame, textCol: String, sourceCol: String,
      vocabSize: Int = 1000): DataFrame = {
    import graft.functions.ExactRound
    val bySrc = graft.Caches.register(docs
      .select(col(sourceCol).as("src__"),
        explode(TextFns.words(col(textCol))).as("w__"))
      .groupBy(col("src__"), col("w__"))
      .agg(count(lit(1)).as("n__"))
      .persist())
    val vocab = bySrc.groupBy(col("w__"))
      .agg(sum(col("n__")).as("cnt__"))
      .orderBy(col("cnt__").desc, col("w__").asc)
      .limit(vocabSize)
      .select(col("w__"), lit(1L).as("in__"))
    bySrc.join(broadcast(vocab), Seq("w__"), "left")
      .groupBy(col("src__"))
      .agg(sum(col("n__")).cast("long").as("total_tokens"),
        sum(when(col("in__").isNull, col("n__")).otherwise(0L))
          .cast("long").as("oov_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("in__").isNull, 1L).otherwise(0L)).cast("long")
          .as("oov_types"))
      .select(col("src__").as(sourceCol), col("total_tokens"),
        col("oov_tokens"), col("n_types"), col("oov_types"),
        ExactRound.ratioScaled(col("oov_tokens"), col("total_tokens"), 6)
          .as("oov_token_rate_e6"),
        ExactRound.ratioScaled(col("oov_types"), col("n_types"), 6)
          .as("oov_type_rate_e6"))
  }

  /** Vocabulary COVERAGE CURVE — what fraction of all token
    * occurrences the top-k types capture, for each requested cutoff
    * (the Zipf-head sizing sheet read before choosing a vocabulary
    * budget; [[oovRate]] is one point of this curve split by source).
    * Type rank is the global (count DESC, word ASC) total order via
    * the range-partitioned [[ScalableRank.withGlobalPosition]] — no
    * global window even with corpus-scale vocabularies — and all
    * cutoffs come out of ONE conditional aggregate over the ranked
    * tally (adding a cutoff adds a column, never a pass), unpivoted
    * to a row per cutoff. */
  def coverageCurve(docs: DataFrame, textCol: String,
      cutoffs: Seq[Long] = Seq(100L, 1000L, 10000L)): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted &&
      cutoffs.distinct.size == cutoffs.size, "cutoffs sorted distinct")
    import graft.functions.ExactRound
    val counts = docs
      .select(explode(TextFns.words(col(textCol))).as("w__"))
      .groupBy(col("w__")).agg(count(lit(1)).as("cnt__"))
    val ranked = ScalableRank.withGlobalPosition(counts,
      Seq(col("cnt__").desc, col("w__").asc), 0, "rank__")
    val aggs = sum(col("cnt__")).cast("long").as("total__") +:
      cutoffs.map(k =>
        sum(when(col("rank__") <= k, col("cnt__")).otherwise(0L))
          .cast("long").as(s"c${k}__"))
    val one = ranked.agg(aggs.head, aggs.tail: _*)
    val stacked = cutoffs.map(k =>
      one.select(lit(k).as("cutoff"), col(s"c${k}__").as("vocab_tokens"),
        col("total__").as("total_tokens")))
      .reduce(_ unionByName _)
    stacked.select(col("cutoff"), col("vocab_tokens"),
      col("total_tokens"),
      ExactRound.ratioScaled(col("vocab_tokens"), col("total_tokens"), 6)
        .as("coverage_e6"))
  }
}
