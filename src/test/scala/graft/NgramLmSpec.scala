package graft

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("Laplace bigram likelihood matches hand-computed counts") {
    // corpus: bigram stream (a,b)x3 + (b,a)x1; prefixes a=3, b=1;
    // vocabulary {a, b, x} = 3
    //   p(b|a) = (3+1)/(3+3) = 2/3 -> e6 666667 (round half-up)
    //   p(a|b) = (1+1)/(1+3) = 1/2 -> e6 500000
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = NgramLm.bigramLikelihood(docs, "doc_id", "text").rowsSet
    assert(out == Set(
      Seq(1L, 3L, 1833334L, 500000L, 666667L), // (a,b),(b,a),(a,b)
      Seq(2L, 1L, 666667L, 666667L, 666667L),
      Seq(3L, 0L, 0L, 0L, 0L)))                 // no bigrams
    Caches.unpersistAll(blocking = true)
  }

  test("scores are partitioning-independent") {
    val docs = (1L to 60L).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 7} w${i % 5} w${(i * 5) % 3}"))
      .toDF("doc_id", "text")
    val a = NgramLm.bigramLikelihood(docs, "doc_id", "text")
    val b = NgramLm.bigramLikelihood(docs.repartition(11), "doc_id", "text")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    Caches.unpersistAll(blocking = true)
  }
}
