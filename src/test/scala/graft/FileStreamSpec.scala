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

  test("streaming decontamination drops benchmark-contaminated docs per batch") {
    val root = Files.createTempDirectory("graft_decontam_stream")
    val src = s"$root/incoming"
    val target = s"$root/clean"
    val checkpoint = s"$root/checkpoint"
    new java.io.File(src).mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = Streams.runAvailableNow(
        Streams.decontaminateSink(stream, bench, "doc_id", "text",
          target, n = 3, threshold = 0.5), checkpoint)
      q.awaitTermination()
    }

    // doc 1 is mostly benchmark text (contaminated); doc 2 is clean
    Seq((1L, s"$benchText plus tail"),
        (2L, "totally unrelated words nothing shared here at all okay"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    val kept = spark.read.parquet(target)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"contaminated doc must be dropped: $kept")

    // a later batch with another clean doc appends incrementally
    Seq((3L, "more fresh material entirely distinct from the benchmark"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    spark.catalog.refreshByPath(target)
    assert(spark.read.parquet(target).select($"doc_id")
      .as[Long].collect().toSet == Set(2L, 3L))
  }
}
