package graft

import org.apache.spark.sql.functions._
import graft.operators.VocabBuild

class VocabBuildSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta alpha gamma"),
    (2L, "alpha beta beta"),
    (3L, "alpha delta"),
    (4L, "epsilon")
  ).toDF("doc_id", "text")

  test("cf, df, and rank with deterministic tie-break") {
    val out = VocabBuild.topTokens(docs, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Int)].collect().toList
    // alpha cf=4 df=3; beta cf=3 df=2; rest cf=1 ties broken by token asc
    assert(out.take(2) === List(("alpha", 4L, 3L, 1), ("beta", 3L, 2L, 2)))
    assert(out.map(_._1).drop(2) === List("delta", "epsilon", "gamma"))
    assert(out.map(_._4) === (1 to 5).toList)
  }

  test("minDocFreq prunes rare tokens; topK truncates after the tie-break order") {
    val out = VocabBuild.topTokens(docs, "doc_id", "text",
      topK = 1, minDocFreq = 2L)
      .as[(String, Long, Long, Int)].collect().toList
    assert(out === List(("alpha", 4L, 3L, 1)))
  }
}
