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
}
