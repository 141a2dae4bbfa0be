package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign token-counted documents to
  * fixed-capacity context windows ("packs") so batches carry minimal
  * padding. Greedy NEXT-FIT in a deterministic document order — walk
  * docs by ascending id, append to the current pack while it fits, else
  * open a new pack.
  *
  * Packing is inherently sequential (each decision depends on the
  * running fill), so the parallelism unit is a BUCKET: docs are
  * bucketed by `id mod nBuckets` and each bucket packs independently.
  * Bucket count is the scale knob — at corpus scale use
  * O(cluster cores) buckets; each bucket's scan is a single pass over
  * its docs. The cross-bucket packing loss vs one global sequence is
  * the tail pack of each bucket (≤ nBuckets · capacity tokens total) —
  * negligible, and global next-fit order would serialize the corpus.
  *
  * This is one of the rare genuinely imperative per-partition
  * operators (running state with reset — not prefix-sum decomposable,
  * so no window formulation exists): buckets are hash-shuffled,
  * sorted (bucket, id) within partitions, and a `mapPartitions` scan
  * carries (bucket, used, seq) state, resetting on bucket change.
  * Deterministic: the scan order is the sort order, and state never
  * crosses buckets, so the result is independent of which buckets
  * co-reside in a partition.
  *
  * Oversize documents (tokens > capacity) open a pack of their own and
  * the next document always starts fresh — they fall out of the same
  * fits-test with no special case; callers wanting truncation should
  * cap the token column upstream (Cleanse.capMetric).
  */
object SequencePack {

  /** Pack by greedy next-fit: returns (idCol, n_tokens, bucket,
    * pack_seq, pack_offset) — pack_seq numbers packs within a bucket
    * from 0, pack_offset is the doc's first token slot in its pack.
    * Rows with a NULL id or NULL token count are dropped (a doc without
    * a measured length cannot be placed deterministically). */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, nBuckets: Int = 16): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("toks"))
      .filter(col("id").isNotNull && col("toks").isNotNull)
      .select(col("id"), col("toks"),
        pmod(col("id"), lit(nBuckets.toLong)).as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .as[(Long, Long, Long)]
    val packed = prepared.mapPartitions { it =>
      var curBucket = -1L
      var used = 0L
      var seq = -1L
      it.map { case (id, toks, bucket) =>
        if (bucket != curBucket) { curBucket = bucket; used = 0L; seq = -1L }
        if (seq < 0L || used + toks > capacity) { seq += 1; used = 0L }
        val off = used
        used += toks
        (id, toks, bucket, seq, off)
      }
    }
    packed.toDF(idCol, "n_tokens", "bucket", "pack_seq", "pack_offset")
  }

  /** Pack-level summary: per (bucket, pack_seq), the doc count, token
    * fill, and utilization against `capacity` — the padding-waste
    * metric a packing run is judged by. */
  def packStats(packs: DataFrame, capacity: Long): DataFrame =
    packs.groupBy(col("bucket"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"))
      // fill/capacity is tie-prone under round(double) by construction
      // (e.g. 8/256 = 0.03125) → exact integer rounding, see ExactRound
      .withColumn("utilization",
        graft.functions.ExactRound.ratio(
          least(col("fill"), lit(capacity)), lit(capacity), 4))

  /** Materialize packs into training examples: join document text back
    * by id and concatenate each pack's docs IN OFFSET ORDER with `sep`.
    * Output: (bucket, pack_seq, n_docs, fill, pack_text).
    *
    * Ordered concatenation uses sort_array over the pack's collected
    * (offset, text) structs + one transform/array_join — the lambda is
    * interpreted, but it runs over ONE pack's docs at a time (bounded
    * by capacity, not corpus size) and makes the result independent of
    * partitioning; the codegen'd alternative (repartition + in-partition
    * sort + order-sensitive collect_list) ties correctness to aggregate
    * iteration order. Structs sort lexicographically, and offsets are
    * unique within a pack, so the order is total. */
  def materialize(packs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, sep: String = " "): DataFrame = {
    val joined = packs.join(
      docs.select(col(idCol), col(textCol)), Seq(idCol))
    joined.groupBy(col("bucket"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"),
        sort_array(collect_list(struct(col("pack_offset"), col(idCol),
          col(textCol).as("t__")))).as("parts__"))
      .withColumn("pack_text",
        array_join(expr("transform(parts__, x -> x.t__)"), sep))
      .drop("parts__")
  }

  /** Pack digests for cross-engine verification: per pack, an
    * ORDER-INDEPENDENT 64-bit digest of the member set — XOR of each
    * member's `md5_prefix64(doc_id '@' pack_offset '@' text)` — split
    * into two 32-bit halves so both engines XOR small non-negative
    * BIGINTs (no sign or overflow semantics anywhere).
    *
    * Rationale: the members + their offsets + the join-back text fully
    * determine `materialize`'s pack_text (offset order is total), but
    * hashing an md5 over a multi-KB ORDER-BY concatenation proved
    * driver-environment-sensitive two rounds running (r7 raw text, r8
    * md5-of-concat) while every component query (q53 packing, q20 md5)
    * stayed green. XOR over per-member digests pins the same content
    * with no ordered aggregation and no large intermediate string. */
  def packDigests(packs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val joined = packs.join(
      docs.select(col(idCol), col(textCol)), Seq(idCol))
    // coalesce BEFORE concat: Spark's concat_ws SKIPS a null operand
    // ("id@off") while DuckDB's concat keeps the separators
    // ("id@off@") — a null text would hash differently per engine
    val member = concat_ws("@", col(idCol).cast("string"),
      col("pack_offset").cast("string"), coalesce(col(textCol), lit("")))
    joined
      .withColumn("h64__", graft.expressions.Md5Prefix64(member))
      .groupBy(col("bucket"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"),
        expr("bit_xor(shiftrightunsigned(h64__, 32))").as("digest_hi"),
        expr("bit_xor(h64__ & 4294967295)").as("digest_lo"))
  }
}
