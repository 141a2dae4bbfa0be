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
    assert(graft.sinks.MergeByKey.readCommitted(spark, target).rowsSet ==
      Set(Seq("A", 1.0), Seq("B", 2.0)))

    // second drop: B updated, C new — only the new file is processed
    Seq(("B", 20.0), ("C", 3.0)).toDF("k", "v")
      .write.mode("append").parquet(src)
    runOnce()
    spark.catalog.refreshByPath(target)
    assert(graft.sinks.MergeByKey.readCommitted(spark, target).rowsSet ==
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

  test("idempotent sink: a replayed batch overwrites, never duplicates") {
    val root = Files.createTempDirectory("graft_idem")
    val src = s"$root/incoming"
    val target = s"$root/out"
    val checkpoint = s"$root/ckpt"
    new java.io.File(src).mkdirs()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType)))
    Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = Streams.runAvailableNow(
      Streams.idempotentAppendSink(stream, target), checkpoint)
    q.awaitTermination()
    spark.catalog.refreshByPath(target)
    assert(spark.read.parquet(target).count() == 2)
    // simulate the at-least-once failure window: the batch's files
    // committed but the checkpoint never recorded it -> the batch
    // REPLAYS with the same id. The batchId-keyed dynamic overwrite
    // must leave the sink identical, where a plain append doubles it.
    Streams.writeBatchIdempotent(
      Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v"), 0L, target)
    spark.catalog.refreshByPath(target)
    val rows = spark.read.parquet(target)
    assert(rows.count() == 2, "replay must not duplicate")
    assert(rows.select($"k").as[String].collect().toSet == Set("A", "B"))
    // a DIFFERENT batch id still appends
    Streams.writeBatchIdempotent(
      Seq(("C", 3.0)).toDF("k", "v"), 1L, target)
    spark.catalog.refreshByPath(target)
    assert(spark.read.parquet(target).count() == 3)
  }
}
