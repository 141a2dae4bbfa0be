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

  test("upsert to versioned store: create then merge, manifest resolves") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    val first = Seq(("A", 1.0), ("B", 2.0)).toDF("k", "v")
    MergeByKey.upsert(spark, first, dir, "k")
    assert(MergeByKey.committedVersion(spark, dir) === Some(0L))
    val second = Seq(("B", 20.0), ("C", 3.0)).toDF("k", "v")
    MergeByKey.upsert(spark, second, dir, "k")
    assert(MergeByKey.committedVersion(spark, dir) === Some(1L))
    val out = MergeByKey.readCommitted(spark, dir).rowsSet
    assert(out == Set(Seq("A", 1.0), Seq("B", 20.0), Seq("C", 3.0)))
  }

  test("upsert with outputPartitions bounds the file count") {
    val dir = Files.createTempDirectory("graft_merge_parts").toString + "/t"
    val df = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "v")
    MergeByKey.upsert(spark, df, dir, "k", outputPartitions = 2)
    val files = new java.io.File(dir + "/v=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 2)
    assert(MergeByKey.readCommitted(spark, dir).count() == 1000)
  }

  test("overwrite: truncate-and-load") {
    val dir = Files.createTempDirectory("graft_ovw").toString + "/t"
    MergeByKey.overwrite(Seq(("A", 1)).toDF("k", "v"), dir)
    MergeByKey.overwrite(Seq(("B", 2)).toDF("k", "v"), dir)
    assert(MergeByKey.readCommitted(spark, dir).rowsSet == Set(Seq("B", 2)))
  }

  test("snapshot isolation: a reader's resolved snapshot survives a " +
    "concurrent merge commit (r15 verdict #5)") {
    val dir = Files.createTempDirectory("graft_snap").toString + "/t"
    MergeByKey.upsert(spark, Seq(("A", 1.0)).toDF("k", "v"), dir, "k")
    // reader resolves the manifest NOW (v=0) and holds the plan lazily
    val snapshot = MergeByKey.readCommitted(spark, dir)
    // two writers commit v=1 and v=2 under the reader; retain=2 keeps
    // v=1, deletes v=0 only at the v=2 commit — so materialize after
    // ONE commit (the documented one-merge-cycle slack), then again
    // to show the snapshot is stable across repeated actions
    MergeByKey.upsert(spark, Seq(("B", 2.0)).toDF("k", "v"), dir, "k")
    assert(snapshot.rowsSet == Set(Seq("A", 1.0)),
      "reader mid-cycle must still see its resolved version")
    assert(snapshot.rowsSet == Set(Seq("A", 1.0)), "re-read is stable")
    // a FRESH resolution sees the new commit
    assert(MergeByKey.readCommitted(spark, dir).rowsSet ==
      Set(Seq("A", 1.0), Seq("B", 2.0)))
  }

  test("retention: versions older than the previous are GC'd; legacy " +
    "flat stores migrate on first versioned commit") {
    val dir = Files.createTempDirectory("graft_gc").toString + "/t"
    // legacy flat store written without versioning
    Seq(("A", 1.0)).toDF("k", "v").write.parquet(dir)
    // first versioned commit migrates: reads flat data as existing
    MergeByKey.upsert(spark, Seq(("B", 2.0)).toDF("k", "v"), dir, "k")
    assert(MergeByKey.readCommitted(spark, dir).rowsSet ==
      Set(Seq("A", 1.0), Seq("B", 2.0)))
    // legacy root files gone after the commit
    assert(!new java.io.File(dir).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))
    MergeByKey.upsert(spark, Seq(("C", 3.0)).toDF("k", "v"), dir, "k")
    MergeByKey.upsert(spark, Seq(("D", 4.0)).toDF("k", "v"), dir, "k")
    val versions = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted
    assert(versions.toSeq == Seq("v=1", "v=2"),
      "retain=2: committed + previous only")
    assert(MergeByKey.readCommitted(spark, dir).rowsSet == Set(
      Seq("A", 1.0), Seq("B", 2.0), Seq("C", 3.0), Seq("D", 4.0)))
  }
}
