package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Training-data export: a deterministic global shuffle of the corpus
  * into `numShards` balanced, internally-ordered shards — the last step
  * before a dataloader consumes the data, where "shuffled once, the
  * same way, for every rerun" is the reproducibility contract.
  *
  * The permutation is the sort order of (md5(key), key) — pseudo-random
  * in content, engine-reproducible (same digest of the same key string
  * as every other hash-keyed curation op), and skew-free BY CONSTRUCTION
  * (digests are uniform regardless of key distribution). Shards are
  * dealt round-robin over that order:
  *
  *   shard    = (pos − 1) mod S
  *   position = (pos − 1) div S
  *
  * so shard sizes differ by at most one row — exact balance, which
  * hash-mod sharding only achieves in expectation — and every shard is
  * itself a uniform sample of the permuted corpus (a dataloader reading
  * any shard prefix sees an unbiased slice).
  *
  * The global position comes from [[ScalableRank.withGlobalPosition]]:
  * a RangePartitioner sort over the digest (never a single-partition
  * window), per-partition offsets from one codegen'd aggregate, rows in
  * unsafe format throughout — the shape that survives a 1000-executor
  * corpus. NULL keys are excluded ([[Sampling.hashSample]]'s rule: no
  * stable decision exists for them).
  */
object ShardExport {

  /** Attach (shard, position) to every row. Deterministic in the key
    * alone — stable across reruns, repartitionings, and engines. */
  def assign(df: DataFrame, keyCol: String, numShards: Int,
      shardCol: String = "shard", posCol: String = "position"): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val keyed = df.filter(col(keyCol).isNotNull)
      .withColumn("graft_h__", md5(col(keyCol).cast("string")))
    ScalableRank.withGlobalPosition(
        keyed, Seq(col("graft_h__").asc, col(keyCol).asc),
        nParts = 0, posCol = "graft_pos__")
      .withColumn(shardCol, (col("graft_pos__") - 1) % numShards)
      .withColumn(posCol, expr(s"(graft_pos__ - 1) div $numShards"))
      .drop("graft_h__", "graft_pos__")
  }

  /** RENDEZVOUS (highest-random-weight, Thaler & Ravishankar 1998)
    * shard assignment — each key goes to the shard with the largest
    * md5(key ":" shard) digest. Unlike [[assign]]'s position-mod
    * (which reshuffles ~everything when the shard count changes),
    * HRW moves a key ONLY when the winning shard is the newly added
    * one: growing k→k+1 relocates exactly the keys the new shard
    * wins (~1/(k+1) of the corpus), the minimal-movement property
    * consistent re-sharding needs. Digest comparison is on the hex
    * string (order-isomorphic to the 128-bit value, the
    * [[Sampling]] convention); the impossible exact tie would break
    * to the smaller shard id.
    *
    * Shape at scale: one row-wise array_max over k structs — a
    * narrow map, no shuffle, codegen-friendly; k is bounded (≤ 64)
    * so the per-row work is constant. */
  def rendezvousAssign(df: DataFrame, keyCol: String, numShards: Int,
      outCol: String = "shard"): DataFrame = {
    require(numShards >= 1 && numShards <= 64,
      "numShards must be in [1, 64]")
    val entries = (0 until numShards).map(s =>
      struct(md5(concat(col(keyCol).cast("string"), lit(":"),
        lit(s.toString))).as("h__"),
        lit(-s).as("ns__")))
    df.withColumn(outCol,
      (-array_max(array(entries: _*)).getField("ns__")).cast("long"))
  }

  /** Write the assigned frame as one directory per shard with rows in
    * position order inside each file: repartition BY the shard column
    * (each shard's rows land in one task), sort that task by position,
    * emit `partitionBy(shard)` — parquet preserves in-file row order,
    * so a dataloader streams each shard sequentially with zero
    * read-time sorting. */
  def writeShards(assigned: DataFrame, path: String,
      shardCol: String = "shard", posCol: String = "position"): Unit =
    assigned
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write
      .partitionBy(shardCol)
      .mode("overwrite")
      .parquet(path)
}
