package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("windows advance by stride with a short unpadded tail") {
    // 10 tokens, size 4, overlap 1 -> stride 3; K = ceil(9/3) = 3
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "doc_id", "text", 4, 1).rowsSet
    assert(out == Set(
      Seq(1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      Seq(1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      Seq(1L, 2L, 6L, 4L, "t6 t7 t8 t9")))
  }

  test("last window never starts past the tokens; no zero-token chunks") {
    // 9 tokens, size 4, overlap 1, stride 3: K = ceil(8/3) = 3; the
    // third window is 6..9 (3 tokens, short tail)
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "doc_id", "text", 4, 1)
    val rows = out.select($"chunk_idx", $"n_tok").rowsSet
    assert(rows == Set(Seq(0L, 4L), Seq(1L, 4L), Seq(2L, 3L)))
  }

  test("short docs yield one whole-doc chunk; nulls yield none") {
    val docs = Seq((1L, Some("only three words")), (2L, None))
      .toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "doc_id", "text", 16, 4).rowsSet
    assert(out == Set(Seq(1L, 0L, 0L, 3L, "only three words")))
  }

  test("zero overlap tiles the doc exactly") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "doc_id", "text", 2, 0)
      .select($"chunk_text").as[String].collect().toSet
    assert(out == Set("a b", "c d", "e f"))
  }

  test("rejects invalid size/overlap") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.slidingWindows(docs, "doc_id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.slidingWindows(docs, "doc_id", "text", 0, 0)
    }
  }
}
