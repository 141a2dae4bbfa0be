package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-rule training — the first `rounds` byte-pair-encoding
  * merges learned from the corpus (Sennrich et al. '16): per round,
  * count adjacent symbol pairs weighted by word frequency, adopt the
  * most frequent pair (ties: lexicographic (left, right) — a pinned
  * total order both engines share) as a merge rule, and apply it
  * left-to-right non-overlapping everywhere. The merge table IS a
  * tokenizer artifact: the thing an LLM-data pipeline trains once per
  * corpus and ships next to the vocab.
  *
  * Shape at scale: BPE statistics live on the WORD-FREQUENCY table —
  * the corpus collapses to its vocabulary (one groupBy) before any
  * pair work, so each round is a vocabulary-sized pass, not a corpus
  * pass; the per-round argmax is a 1-row `limit(1)` collect (bounded
  * driver state, the P-offsets discipline), and the merge application
  * is a codegen'd string `replace` on the space-joined symbol form
  * ("a b c" — symbols are split on whitespace, so the joined form is
  * unambiguous). `replace` scans left-to-right non-overlapping in
  * both engines (Java String.replace / DuckDB replace), which is
  * exactly BPE's greedy application rule.
  */
object BpeTrain {

  /** "abc" -> "a b c" (per code point; the initial symbol state). */
  private def charSyms(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Train `rounds` merges; returns (merge table rows, the word table
    * (w, freq, syms) with every adopted merge applied). The word table
    * carries the trained segmentation — [[encodeTokenCounts]] reads
    * tokens-per-word straight off it. */
  private def trainRounds(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 16,
      "each round is a full vocabulary pass; rounds in [1, 16]")
    val wf = graft.Caches.register(df
      .select(explode(graft.functions.TextFns.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", charSyms(col("w")))
      .persist())
    var cur = wf
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top = cur
        .filter(size(split(col("syms"), " ")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(split(syms, ' ')) - 1), " +
            "i -> struct(element_at(split(syms, ' '), i) AS l, " +
            "element_at(split(syms, ' '), i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, l + r, c))
        // literal args via lit(), never SQL interpolation — corpus
        // symbols may contain quotes
        cur = cur.withColumn("syms", call_function("replace",
          col("syms"), lit(s"$l $r"), lit(l + r)))
      }
    }
    (merges.result(), cur)
  }

  /** The first `rounds` merges: (merge_rank, left_sym, right_sym,
    * merged, pair_count). Stops early (fewer rows) if the vocabulary
    * runs out of adjacent pairs. */
  def topMerges(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainRounds(df, idCol, textCol, rounds)._1
      .toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** APPLY the trained merges: per document, the whitespace word count
    * and the BPE token count under the `rounds`-merge model — the
    * train-then-encode round trip a tokenizer pipeline runs, and the
    * corpus statistic (tokens before/after merging) that prices a
    * vocabulary. Encoding cost is per DISTINCT WORD (the merge chain
    * runs on the vocabulary table once); documents join their words
    * against the encoded vocabulary — at 100 TB the corpus pass is
    * one explode + one hash join on word, never a per-doc merge
    * scan. */
  def encodeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val (_, encoded) = trainRounds(df, idCol, textCol, rounds)
    val wordTokens = encoded.select(col("w"),
      size(split(col("syms"), " ")).cast("long").as("n_toks__"))
    val docWords = df
      .select(col(idCol),
        explode(graft.functions.TextFns.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val per = docWords.join(wordTokens, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks__")).as("n_bpe_tokens"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
