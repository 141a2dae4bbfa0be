package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Sliding-window document chunking: split each document's token stream
  * into windows of `size` tokens advancing by `size - overlap`, the
  * retrieval/context-window preprocessing step (RAG indexing, long-doc
  * eval harnesses).
  *
  * Chunk count is closed-form — K = max(ceil((tokens − overlap)/stride),
  * 1) — so the operator is one narrow projection + a sequence explode +
  * an array slice per chunk: no shuffle at all, embarrassingly parallel,
  * and every expression is codegen'd (positions are exploded as ints;
  * nothing goes through an interpreted lambda).
  *
  * Boundary semantics (spec-pinned):
  *   - the last window is SHORT, never padded, and never starts past
  *     `tokens` (the K formula stops once a window would add no new
  *     tokens);
  *   - a doc shorter than `size` yields exactly one whole-doc chunk;
  *   - a NULL text yields no chunks; an empty text follows the
  *     tokenizer's semantics (one empty token — consistent with
  *     `tokenCounts`' word accounting).
  *
  * Integer math discipline: K uses integer floor-division on a
  * non-negative numerator (`greatest(tokens − overlap, 0)`) — signed
  * floor-vs-truncate division disagreement between engines never
  * arises. */
object Chunking {

  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0, "size must be positive")
    require(overlap >= 0 && overlap < size, "0 <= overlap < size")
    val stride = size - overlap
    val staged = df
      .select(col(idCol), TextFns.words(col(textCol)).as("ws__"))
      .filter(col("ws__").isNotNull)
      .select(col(idCol), col("ws__"),
        org.apache.spark.sql.functions.size(col("ws__")).cast("long")
          .as("nt__"))
      .filter(col("nt__") > 0)
      .select(col(idCol), col("ws__"), col("nt__"),
        greatest(
          expr(s"(greatest(nt__ - $overlap, 0L) + ${stride - 1}) div $stride"),
          lit(1L)).as("k__"))
    staged
      .select(col(idCol), col("ws__"), col("nt__"),
        explode(sequence(lit(0L), col("k__") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(size.toLong), col("nt__") - col("chunk_idx") * stride)
          .as("n_tok"),
        array_join(
          slice(col("ws__"), (col("chunk_idx") * stride + 1).cast("int"),
            least(lit(size.toLong), col("nt__") - col("chunk_idx") * stride)
              .cast("int")),
          " ").as("chunk_text"))
  }

  /** Content-defined chunking — the rsync/LBFS boundary rule applied to
    * text, the DEDUP-FRIENDLY chunker: an insertion early in a document
    * shifts every fixed-width window after it, but content-defined
    * boundaries re-synchronize within ~one expected chunk, so the
    * unchanged tail keeps its chunk identity and chunk-level dedup
    * across near-identical documents actually fires (fixed windows
    * would see every downstream chunk as new).
    *
    * Rule: a chunk ENDS at 1-based char position i of the normalized
    * text when the md5-prefix64 of the k-char window ending at i has
    * its low `maskBits` bits zero — expected chunk length 2^maskBits
    * chars; the tail past the last boundary is always a final chunk,
    * and a doc with no boundary (or shorter than k) is one whole-doc
    * chunk. Output: (id, sa, sb, chunk_text) spans.
    *
    * Shape: one position explode (len−k+1 rows/doc), the per-position
    * codegen'd hash filter (boundaries only survive — ~len/2^maskBits
    * rows), then ONE per-doc lag window over boundary rows to pair
    * consecutive boundaries — the shuffle carries boundary positions,
    * never windows. Same span-stitching discipline as
    * [[SubstringDedup]]. */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, maskBits: Int = 5): DataFrame = {
    require(k >= 1 && maskBits >= 1 && maskBits <= 16,
      "need k >= 1 and maskBits in [1, 16]")
    val mask = (1L << maskBits) - 1L
    val base = df.select(col(idCol),
        trim(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("tn__"))
      .withColumn("len__", length(col("tn__")).cast("long"))
    val bounds = base.filter(col("len__") >= k)
      .select(col(idCol), col("len__"),
        explode(sequence(lit(k.toLong), col("len__"))).as("i"),
        col("tn__"))
      .filter((graft.expressions.Md5Prefix64(
          expr(s"substring(tn__, CAST(i - ${k - 1} AS INT), $k)"))
        .bitwiseAND(lit(mask))) === 0L)
      .select(col(idCol), col("i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("i"))
    val spans = bounds
      .withColumn("sa", coalesce(lag(col("i"), 1).over(w) + 1L, lit(1L)))
      .select(col(idCol), col("sa"), col("i").as("sb"))
    val lastB = bounds.groupBy(col(idCol)).agg(max(col("i")).as("e__"))
    val tails = lastB.join(base, Seq(idCol))
      .filter(col("len__") > col("e__"))
      .select(col(idCol), (col("e__") + 1L).as("sa"), col("len__").as("sb"))
    val wholes = base
      .join(bounds.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .filter(col("len__") > 0L)
      .select(col(idCol), lit(1L).as("sa"), col("len__").as("sb"))
    spans.unionByName(tails).unionByName(wholes)
      .join(base.select(col(idCol), col("tn__")), Seq(idCol))
      .select(col(idCol), col("sa"), col("sb"),
        expr("substring(tn__, CAST(sa AS INT), CAST(sb - sa + 1 AS INT))")
          .as("chunk_text"))
  }
}
