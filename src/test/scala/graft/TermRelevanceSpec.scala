package graft

import graft.operators.TermRelevance

class TermRelevanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join fast"),
    (2L, "spark spark slow"),
    (3L, "other words here entirely"),
    (4L, "window")
  ).toDF("doc_id", "text")

  // reference computation, same shape as the operator
  private def expected(tf: Seq[Long], dl: Long): Double = {
    val k1 = 1.2; val b = 0.75
    val n = 4.0; val avgdl = 11.0 / n
    val dfs = Seq(2.0, 1.0, 1.0) // spark, join, window
    val norm = (1.0 - b) + b * dl.toDouble / avgdl
    val raw = tf.zip(dfs).map { case (f, df) =>
      ((n - df + 0.5) / (df + 0.5)) *
        (f.toDouble * (k1 + 1.0) / (f.toDouble + k1 * norm))
    }.reduceLeft(_ + _)
    BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25 scores match the closed-form computation; misses excluded") {
    val out = TermRelevance.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "window")).rowsSet
    assert(out == Set(
      Seq(1L, 3L, 2L, expected(Seq(1, 1, 0), 3)),
      Seq(2L, 3L, 1L, expected(Seq(2, 0, 0), 3)),
      Seq(4L, 1L, 1L, expected(Seq(0, 0, 1), 1))))
  }

  test("rarer terms weigh more at equal tf") {
    // doc 1 hits spark (df 2) once and join (df 1) once at the same tf;
    // a single-term query on the rarer term must score higher
    val sparkOnly = TermRelevance.bm25(docs, "doc_id", "text", Seq("spark"))
      .filter($"doc_id" === 1L).select($"score").as[Double].head()
    val joinOnly = TermRelevance.bm25(docs, "doc_id", "text", Seq("join"))
      .filter($"doc_id" === 1L).select($"score").as[Double].head()
    assert(joinOnly > sparkOnly)
  }

  test("logIdf variant keeps the hit set and positivity") {
    val out = TermRelevance.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "window"), logIdf = true)
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    assert(out.filter($"score" <= 0.0).isEmpty)
  }

  test("rejects duplicate terms") {
    intercept[IllegalArgumentException] {
      TermRelevance.bm25(docs, "doc_id", "text", Seq("a", "a"))
    }
  }
}
