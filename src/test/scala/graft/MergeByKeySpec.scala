package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.MergeByKey

class MergeByKeySpec extends SparkSpec {
  import spark.implicits._

  test("merge: incoming wins per column where non-null, rows union by key") {
    val existing = Seq(("A", Some(1.0), Some("x")), ("B", Some(2.0), Some("y")))
      .toDF("k", "v", "s")
    val incoming = Seq(("B", Some(20.0), Option.empty[String]), ("C", Some(3.0), Some("z")))
      .toDF("k", "v", "s")
    val out = MergeByKey.merge(existing, incoming, "k").rowsSet
    assert(out == Set(
      Seq("A", 1.0, "x"),
      Seq("B", 20.0, "y"),   // v overwritten, s kept (incoming null)
      Seq("C", 3.0, "z")))
  }

  test("merge: incoming-only columns appear; overwriteColumns restricts updates") {
    val existing = Seq(("A", 1.0, "keep")).toDF("k", "v", "s")
    val incoming = Seq(("A", 9.0, "new", 42L)).toDF("k", "v", "s", "extra")
    val out = MergeByKey.merge(existing, incoming, "k",
      overwriteColumns = Some(Seq("v", "extra"))).rowsSet
    // s NOT in overwriteColumns -> existing value kept
    assert(out == Set(Seq("A", 9.0, "keep", 42L)))
  }

  test("upsert to parquet: create then merge, staging swap leaves one dir") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    val first = Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
    MergeByKey.upsert(spark, first, dir, "k")
    val second = Seq(("B", 20.0), ("C", 3.0)).toDF("k", "v")
    MergeByKey.upsert(spark, second, dir, "k")
    val out = spark.read.parquet(dir).rowsSet
    assert(out == Set(Seq("A", 1.0), Seq("B", 20.0), Seq("C", 3.0)))
    assert(!new java.io.File(dir + "._staging").exists())
    assert(!new java.io.File(dir + "._old").exists())
  }

  test("upsert with outputPartitions bounds the file count") {
    val dir = Files.createTempDirectory("graft_merge_parts").toString + "/t"
    val df = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "v")
    MergeByKey.upsert(spark, df, dir, "k", outputPartitions = 2)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("overwrite: truncate-and-load") {
    val dir = Files.createTempDirectory("graft_ovw").toString + "/t"
    MergeByKey.overwrite(Seq(("A", 1)).toDF("k", "v"), dir)
    MergeByKey.overwrite(Seq(("B", 2)).toDF("k", "v"), dir)
    assert(spark.read.parquet(dir).rowsSet == Set(Seq("B", 2)))
  }
}
