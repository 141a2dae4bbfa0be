package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: measure, per corpus
  * document, how much of its word n-gram mass also appears in a held-out
  * benchmark set, and flag documents above a containment threshold.
  *
  * This is the n-gram–overlap decontamination used by LLM training
  * pipelines (cf. the 13-gram filters described in the GPT-3 and PaLM
  * papers): a benchmark document leaking into pretraining data inflates
  * eval scores, and membership is decided by SHARED n-GRAMS, not exact
  * text equality, so paraphrased or partially quoted leaks are caught.
  *
  * Shape (all linear, shuffle-parallel):
  *   1. distinct word n-grams per corpus doc — the same exploded-shingle
  *      kernel as [[Dedup]] (posexplode + lead window, no interpreted
  *      array lambdas);
  *   2. the benchmark's DISTINCT gram set, broadcast: benchmark suites
  *      are small by construction (thousands of documents, not
  *      billions), so the gram set fits in a broadcast and the per-doc
  *      hit count needs no shuffle of the corpus grams. Set
  *      `broadcastBench = false` for an unusually large benchmark and
  *      the same plan runs as a standard shuffle hash join;
  *   3. per-doc containment = |grams ∩ benchGrams| / |grams|, a groupBy
  *      count — NOT Jaccard: a 100-word leak inside a 10k-word document
  *      should score on the document's own gram count, not be diluted by
  *      the benchmark's total size.
  *
  * Every corpus row is preserved (left joins): a doc with fewer than `n`
  * words has no grams and reports overlap 0.0 — it cannot leak an
  * n-gram it does not contain.
  */
object Decontaminate {

  /** Per-doc overlap report: (id, n_grams, n_hit, overlap, contaminated).
    * `threshold` applies to the UNROUNDED containment ratio; `overlap` is
    * reported rounded to 4dp.
    *
    * Single-pass shape: each corpus gram is marked hit/miss by ONE
    * broadcast left join against the benchmark gram set, and n_grams /
    * n_hit come out of the SAME groupBy — the corpus explode pipeline
    * (the expensive part at scale) runs once, not once per statistic
    * (separate size and hit aggregates would make Spark recompute the
    * whole explode→shuffle→window shingle subtree per branch). */
  def overlapReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.3,
      broadcastBench: Boolean = true): DataFrame = {
    val corpusGrams = Dedup.explodedShingles(corpus, idCol, textCol, n)
    val benchGrams = {
      val g = Dedup.explodedShingles(bench, idCol, textCol, n)
        .select(col("shingle")).distinct()
        .withColumn("hit__", lit(1L))
      if (broadcastBench) broadcast(g) else g
    }
    val stats = corpusGrams.join(benchGrams, Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit__"), lit(0L))).as("n_hit"))
    assembleReport(corpus, stats, idCol, threshold)
  }

  /** Shared report tail: rejoin per-doc gram stats to the full corpus
    * (docs too short for any gram report 0), derive ratio + flag. */
  private def assembleReport(corpus: DataFrame, stats: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    val ratio = when(col("n_grams") === 0, lit(0.0))
      .otherwise(col("n_hit").cast("double") / col("n_grams").cast("double"))
    corpus.select(col(idCol))
      .join(stats.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        // int/int ratio → exact integer rounding (tie-proof; see
        // ExactRound); the flag keeps the raw double ratio
        graft.functions.ExactRound.ratio(col("n_hit"), col("n_grams"), 4)
          .as("overlap"),
        (ratio >= threshold).as("contaminated"))
  }

  /** Bloom-filter decontamination — the memory-constant scale path of
    * [[overlapReport]]. The benchmark gram set is folded into ONE Bloom
    * filter (a bit array sized by `fpp`, ~10 bits/gram at 1%) instead
    * of a broadcast hash relation (~50+ bytes/gram): at a 10⁸-gram
    * benchmark the sketch is ~120 MB where the exact relation would be
    * gigabytes per executor, and the probe is a codegen'd bit test
    * (the same [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * expression Spark's runtime row-level filters inject) — no join at
    * all on the corpus side, just scan+aggregate.
    *
    * Direction of error is one-sided by construction: Bloom filters
    * have NO false negatives, so `n_hit` >= the exact count per doc and
    * the flagged set is a SUPERSET of the exact flagged set —
    * decontamination fails safe (never ships a leaked doc, may drop a
    * few clean ones; the q40 audit pins both properties). Deterministic:
    * same grams -> same bits (fixed seeds), so reruns agree. The filter
    * is built over xxhash64(gram) longs on the build side and probed
    * with the same expression — one 64-bit pre-hash both sides. */
  def bloomOverlapReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.3, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    val corpusGrams = Dedup.explodedShingles(corpus, idCol, textCol, n)
    val benchGrams = Dedup.explodedShingles(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tree-aggregated build (stat.bloomFilter merges per-partition
    // filters); the count sizes the bit array
    val nItems = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter(xxhash64(col("shingle")), nItems, fpp)
    benchGrams.unpersist(blocking = false)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val hit = GraftSqlBridge.column(BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      GraftSqlBridge.expression(xxhash64(col("shingle")))))
    val stats = corpusGrams
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(hit, lit(1L)).otherwise(lit(0L))).as("n_hit"))
    assembleReport(corpus, stats, idCol, threshold)
  }

  /** Drop contaminated documents, keep everything else — the actionable
    * form: `corpus` minus any doc whose containment is >= `threshold`. */
  def clean(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.3,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = overlapReport(corpus, bench, idCol, textCol, n, threshold,
        broadcastBench)
      .filter(col("contaminated"))
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Cross-split leakage report — eval hygiene the hash split alone
    * cannot give: [[Sampling.splitByHash]] guarantees a DOCUMENT never
    * straddles train/test, but it cannot know two DIFFERENT documents
    * are near-copies of each other; a near-dup pair with endpoints in
    * different splits IS train→eval leakage (the benchmark answer is
    * in the training set under another id). Compose any near-dup pair
    * list (MinHash, embedding, containment — whatever kernel fits the
    * corpus) with any split assignment; the offending pairs come back
    * with both split labels for triage (drop the train side, usually).
    *
    * Scale shape: two equi-joins of the (small, already-reduced) pair
    * list against the split table — the quadratic work happened inside
    * the pair kernel, which is exactly where each kernel's own scale
    * story applies. */
  /** SEMANTIC decontamination report — the embedding-space twin of the
    * n-gram containment check: per corpus vector, the max cosine
    * against ANY benchmark vector, the count of benchmark vectors
    * above `threshold`, and the contamination flag. Catches the
    * paraphrased eval leak n-gram matching cannot see (SemDeDup-style
    * motivation, applied to eval hygiene).
    *
    * Shape at scale: eval/benchmark sets are SMALL by definition
    * (thousands), so the bench side broadcasts and the corpus is
    * scanned ONCE — O(n·|B|·d) fused cosine work inside one codegen'd
    * stage, a map-side-combinable per-id aggregate, no shuffle of the
    * corpus beyond it. The threshold compares the cosine ROUNDED to
    * e6 (r13, mirrored in the oracle): Spark and DuckDB accumulate
    * the dot product in different orders, so a pair sitting exactly
    * at the threshold could otherwise flip the hit count between
    * engines — the exact-rational discipline, applied to the one
    * boundary compare this operator makes. (The reported max stays
    * display-rounded to 4.) */
  def semanticReport(corpus: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val b = bench.select(col(vecCol).as("b_vec__"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(b))
      .withColumn("cos__",
        graft.functions.VectorFns.cosineNative(col(vecCol), col("b_vec__")))
      .groupBy(col(idCol))
      .agg(max(round(col("cos__"), 4)).as("max_cosine"),
        sum(when(round(col("cos__"), 6) >= threshold, 1L).otherwise(0L))
          .as("n_bench_hits"))
      .withColumn("contaminated", col("n_bench_hits") > 0)
  }

  def splitLeakage(pairs: DataFrame, aCol: String, bCol: String,
      splits: DataFrame, keyCol: String,
      splitCol: String = "split"): DataFrame =
    pairs
      .join(splits.select(col(keyCol).as(aCol), col(splitCol).as("split_a")),
        aCol)
      .join(splits.select(col(keyCol).as(bCol), col(splitCol).as("split_b")),
        bCol)
      .filter(col("split_a") =!= col("split_b"))
      // equi-joins hoist their key to the front; restore the caller's
      // pair schema + the two labels
      .select(pairs.columns.map(col).toSeq ++
        Seq(col("split_a"), col("split_b")): _*)
}
