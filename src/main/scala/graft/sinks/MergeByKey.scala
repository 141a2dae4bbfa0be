package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — upsert ("merge-by-key") sink over parquet directories
  * (SURVEY.md §2.1 S7; ref uploadtodb.py:159-198 batched REST upsert).
  *
  * Files have no in-place MERGE, so: read existing ⟗ incoming on the key,
  * per-column coalesce(new, old), write to a staging dir, atomic-ish swap
  * (SURVEY §7 risk 4). Incoming wins per column only where it is
  * non-null — matching Postgres upsert column semantics where every
  * mapped column is overwritten, while letting a technical-only row merge
  * with an earlier fundamental-only row (ref: both pipelines upsert into
  * the same `stock_data`).
  *
  * `overwriteColumns`: when provided, ONLY these columns are taken from
  * the incoming side (ref S9 keyed-update sink, sectorscore.py:142-170).
  *
  * Scale: the merge is one full-outer shuffle join on the key. For
  * repeated merges at 100 TB the existing side should be bucketed by the
  * key (`bucketBy` on write) so the join co-locates without re-shuffling
  * the big side; AQE handles skewed keys.
  */
object MergeByKey {

  def merge(existing: DataFrame, incoming: DataFrame, key: String,
      overwriteColumns: Option[Seq[String]] = None): DataFrame = {
    val e = existing.as("e")
    val i = incoming.as("i")
    val eCols = existing.columns.toSeq
    val iCols = incoming.columns.toSeq
    val updatable = overwriteColumns.getOrElse(iCols.filterNot(_ == key))
    val allCols = (eCols ++ iCols.filterNot(eCols.contains)).filterNot(_ == key)
    val joined = e.join(i, col(s"e.$key") === col(s"i.$key"), "full_outer")
    val keyOut = coalesce(col(s"i.$key"), col(s"e.$key")).as(key)
    val merged = allCols.map { c =>
      val fromE = eCols.contains(c)
      val fromI = iCols.contains(c) && updatable.contains(c)
      (fromE, fromI) match {
        case (true, true) => coalesce(col(s"i.$c"), col(s"e.$c")).as(c)
        case (true, false) => col(s"e.$c").as(c)
        case (false, _) => col(s"i.$c").as(c)
      }
    }
    joined.select(keyOut +: merged: _*)
  }

  /** A8 — per-merge success accounting (the reference logs rows-in /
    * rows-out per batch, uploadtodb.py:160-197; SURVEY §5 count
    * reconciliation). Counts come from the sink's own write, not an
    * extra pass. */
  case class MergeStats(incomingRows: Long, mergedRows: Long)

  /** Merge `incoming` into the parquet dir at `path` (created if absent),
    * staging the output and swapping directories so a failed write never
    * clobbers the previous version. Returns count reconciliation stats.
    */
  def upsert(spark: SparkSession, incoming: DataFrame, path: String,
      key: String, overwriteColumns: Option[Seq[String]] = None,
      outputPartitions: Int = 0): MergeStats = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val merged =
      if (!fs.exists(target)) incoming
      else merge(spark.read.parquet(path), incoming, key, overwriteColumns)
    // repeated merges otherwise accumulate shuffle-partition-many small
    // files per cycle; hash-repartitioning on the key also keeps rows
    // with the same key in one file (compact + predictable)
    val out =
      if (outputPartitions > 0)
        merged.repartition(outputPartitions, org.apache.spark.sql.functions.col(key))
      else merged
    val staging = new org.apache.hadoop.fs.Path(path + "._staging")
    val backup = new org.apache.hadoop.fs.Path(path + "._old")
    out.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // count BEFORE the swap: the incoming lineage may itself read `path`
    // (e.g. a score column derived from the previous table version), and
    // re-executing it after the swap would hit replaced files
    val incomingRows = incoming.count()
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(target)) fs.rename(target, backup)
    fs.rename(staging, target)
    fs.delete(backup, true)
    // the swap replaced every file under `path`: drop any cached listing
    spark.catalog.refreshByPath(path)
    val mergedRows = spark.read.parquet(path).count()
    MergeStats(incomingRows, mergedRows)
  }

  /** S8 truncate-and-load (ref sectormerged_improved.py:629-645). */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
