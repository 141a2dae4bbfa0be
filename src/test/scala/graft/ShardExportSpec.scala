package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ShardExport

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")

  test("shards are exactly balanced and positions are dense per shard") {
    val out = ShardExport.assign(docs(103), "doc_id", numShards = 8)
    val sizes = out.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet === (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(sizes.values.sum === 103L)
    // positions within each shard are 0..size-1 with no gaps
    val dense = out.groupBy("shard")
      .agg(min("position").as("mn"), max("position").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(dense.isEmpty)
  }

  test("assignment is deterministic and independent of partitioning") {
    val a = ShardExport.assign(docs(50), "doc_id", 4)
      .select("doc_id", "shard", "position").as[(Long, Long, Long)]
      .collect().toSet
    val b = ShardExport.assign(docs(50).repartition(13), "doc_id", 4)
      .select("doc_id", "shard", "position").as[(Long, Long, Long)]
      .collect().toSet
    assert(a === b)
  }

  test("order is a permutation, not the input order") {
    // the doc with the smallest md5 gets shard 0 position 0 — verify
    // against an independent computation of the permutation
    val expectFirst = docs(50)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h")).limit(1).as[(Long, String)].head()._1
    val got = ShardExport.assign(docs(50), "doc_id", 4)
      .filter(col("shard") === 0 && col("position") === 0)
      .select("doc_id").as[Long].head()
    assert(got === expectFirst)
  }

  test("null keys are excluded; single shard degenerates to a permutation") {
    val withNull = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("doc_id", "text")
    val out = ShardExport.assign(withNull, "doc_id", 1)
    assert(out.count() === 2)
    assert(out.select(max("position")).as[Long].head() === 1L)
  }

  test("writeShards emits one directory per shard with in-file position order") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val assigned = ShardExport.assign(docs(64), "doc_id", 4)
    ShardExport.writeShards(assigned, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 64)
    assert(back.select("shard").distinct().count() === 4)
    // per shard-directory: row order inside the files is position order
    for (s <- 0 until 4) {
      val rows = spark.read.parquet(s"$dir/shard=$s")
        .select("position").as[Long].collect()
      assert(rows.toSeq === rows.sorted.toSeq, s"shard $s out of order")
    }
  }
}
