package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Scans are plain parquet reads so Catalyst's column pruning and filter
  * pushdown reach the file scan (SURVEY.md §2.1 S1-S4: the reference's
  * manual pagination / manual column selection collapse into this).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Latest-file selection (SURVEY §2.1 S2, ref uploadtodb.py:46-57):
    * resolve newest path matching a glob by modification time, driver-side,
    * before handing the single path to a distributed scan.
    */
  def latestByMtime(spark: SparkSession, globPath: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(globPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.globStatus(path)
    if (statuses == null || statuses.isEmpty) None
    else Some(statuses.maxBy(_.getModificationTime).getPath.toString)
  }
}
