package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streams

/** The cron-cadence streaming shape end-to-end: file source →
  * foreachBatch merge sink → Trigger.AvailableNow catch-up runs with a
  * shared checkpoint (each run processes only files it hasn't seen). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("file stream with AvailableNow merges increments into the warehouse") {
    val root = Files.createTempDirectory("graft_fstream")
    val src = s"$root/incoming"
    val target = s"$root/warehouse/items"
    val checkpoint = s"$root/checkpoint"
    new java.io.File(src).mkdirs()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = Streams.runAvailableNow(
        Streams.mergeSink(stream, target, "k"), checkpoint)
      q.awaitTermination()
    }

    Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(target).rowsSet == Set(Seq("A", 1.0), Seq("B", 2.0)))

    // second drop: B updated, C new — only the new file is processed
    Seq(("B", 20.0), ("C", 3.0)).toDF("k", "v")
      .write.mode("append").parquet(src)
    runOnce()
    spark.catalog.refreshByPath(target)
    assert(spark.read.parquet(target).rowsSet ==
      Set(Seq("A", 1.0), Seq("B", 20.0), Seq("C", 3.0)))
  }
}
