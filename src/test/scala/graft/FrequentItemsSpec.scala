package graft

import org.apache.spark.sql.functions._
import graft.operators.FrequentItems

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: 'a' dominates, 'b' qualifies, a long unique tail
  // forces genuine MG compression (k << distinct items)
  private def skewed = {
    val rows = Seq.fill(300)("a") ++ Seq.fill(120)("b") ++
      Seq.fill(40)("c") ++ (1 to 340).map(i => s"tail_$i")
    rows.toDF("item").repartition(8) // partial buffers + merge path
  }

  test("heavyHitters equals the full-groupBy answer under compression") {
    val k = 4 // threshold N/(k+1) = 800/5 = 160 -> only 'a' qualifies
    val got = FrequentItems.heavyHitters(skewed, "item", k)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 300L)))

    val k2 = 9 // threshold 80 -> 'a' and 'b'
    val got2 = FrequentItems.heavyHitters(skewed, "item", k2)
      .as[(String, Long)].collect().toSet
    assert(got2 === Set(("a", 300L), ("b", 120L)))
  }

  test("MG guarantee audit holds under merge trees and compression") {
    for (k <- Seq(2, 4, 16, 64)) {
      val (boundsOk, noMissed) = FrequentItems.mgGuaranteeAudit(
        skewed, col("item"), k)
      assert(boundsOk, s"bounds violated at k=$k")
      assert(noMissed, s"missed heavy item at k=$k")
    }
  }

  test("exact when k >= distinct items: no decrement ever fires") {
    val df = Seq("x", "y", "x", "z", "x", "y").toDF("item").repartition(3)
    val got = FrequentItems.heavyHitters(df, "item", 10)
      .as[(String, Long)].collect().toSet
    // threshold 6/11 < 1: every item qualifies with exact counts
    assert(got === Set(("x", 3L), ("y", 2L), ("z", 1L)))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[String].toDF("item")
    assert(FrequentItems.heavyHitters(df, "item", 8).isEmpty)
  }

  test("frequentTokens finds the dominant corpus tokens") {
    val docs = Seq(
      (1L, "spark spark spark flink"),
      (2L, "spark spark trino beam"),
      (3L, "spark storm heron samza")
    ).toDF("doc_id", "text")
    // N = 12, k = 3 -> threshold 3: 'spark' (6) qualifies
    val got = FrequentItems.frequentTokens(docs, "text", 3)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("spark", 6L)))
  }
}
