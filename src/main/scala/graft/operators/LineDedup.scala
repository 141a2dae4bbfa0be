package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Line-level cross-document deduplication — the CCNet/RefinedWeb
  * paragraph-dedup stage: a unit of text (here a fixed-width run of
  * words, since the gate corpus is single-line) that appears in MANY
  * documents is boilerplate (headers, cookie banners, license blurbs)
  * and is cut from every document that carries it, while the documents
  * themselves survive. Complements the other dedup axes: q21 drops
  * whole duplicate docs, q71/q87 cut spans repeated WITHIN a doc — this
  * cuts units repeated ACROSS docs.
  *
  * Reference anchor: the reference's news pipeline dedups repeated
  * content units across scrapes (`newsflow_scraper.py:243-327` —
  * URL-keyed append dedup); this is the corpus-scale generalization a
  * training-data pipeline needs.
  *
  * Scale shape (every stage is explode → hash-shuffle → aggregate):
  *   1. (doc, pos, word) via posexplode — zero shuffle;
  *   2. lines: groupBy(doc, seg) with sort_array(collect_list(struct))
  *      reassembly — per-group state is one line's words, bounded by
  *      `lineWords`;
  *   3. line document-frequency: groupBy on the line's md5-prefix64
  *      digest — the shuffle carries 8-byte keys, never line text;
  *   4. drop lines with doc-frequency > `maxDocFreq`, stitch survivors
  *      back per doc (sort_array over (seg, line) structs — per-doc
  *      state is the doc's own kept lines, the same bound as the doc
  *      text itself).
  */
object LineDedup {

  /** (doc, seg, line) rows: normalized words grouped into consecutive
    * `lineWords`-word segments (the last segment may be short). */
  def lines(df: DataFrame, idCol: String, textCol: String,
      lineWords: Int = 10): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode(TextFns.words(col(textCol))).as(Seq("pos", "w")))
      .withColumn("seg", (col("pos") / lineWords).cast("long"))
      .groupBy(col("doc"), col("seg"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ps"))
      .withColumn("line", array_join(expr("transform(ps, x -> x.w)"), " "))
      .select(col("doc"), col("seg"), col("line"))

  /** Per-document trim report: total/kept line counts and the document
    * text with every over-frequent line removed (segment order
    * preserved). A doc whose every line is boilerplate emits an empty
    * string, not a vanished row. Line frequency counts DISTINCT
    * documents (a line repeated within one doc is that doc's own
    * business — q71's axis, not this one). */
  def trimReport(df: DataFrame, idCol: String, textCol: String,
      lineWords: Int = 10, maxDocFreq: Long = 1L): DataFrame = {
    val ls = graft.Caches.register(
      lines(df, idCol, textCol, lineWords).persist())
    // df-count on the 8-byte digest: two map-side-combinable aggregates
    // (distinct (digest, doc) then count per digest); line text never
    // shuffles past stage 2
    val freq = ls
      .select(graft.expressions.Md5Prefix64(col("line")).as("h"), col("doc"))
      .distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
    val tagged = ls
      .withColumn("h", graft.expressions.Md5Prefix64(col("line")))
      .join(freq, "h")
    val kept = tagged.filter(col("n_docs") <= maxDocFreq)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        sort_array(collect_list(struct(col("seg"), col("line")))).as("parts__"))
      .withColumn("text_trimmed",
        array_join(expr("transform(parts__, x -> x.line)"), " "))
      .select(col("doc"), col("n_kept"), col("text_trimmed"))
    val totals = ls.groupBy(col("doc")).agg(count(lit(1)).as("n_lines"))
    df.select(col(idCol).as("doc"))
      .join(totals, Seq("doc"), "left")
      .join(kept, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_trimmed"), lit("")).as("text_trimmed"))
  }
}
