package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage for shuffle-free repeated joins (SURVEY §7,
  * MergeByKey scale note): writing both sides of a recurring join
  * bucketed+sorted by the key lets SortMergeJoin read co-located
  * buckets with NO exchange and NO sort at query time — the shuffle is
  * paid once at write time instead of per query. This is the 100 TB
  * answer for the stock_data ⋈ rankings family of joins.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
