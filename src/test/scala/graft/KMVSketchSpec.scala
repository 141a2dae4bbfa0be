package graft

import org.apache.spark.sql.functions._
import graft.expressions.KMVSketch

class KMVSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, approximate within ~10% above k, deterministic") {
    val small = (1 to 100).map(i => s"v$i").toDF("x")
    val exactSmall = small.agg(
      KMVSketch.approx_distinct_kmv($"x", k = 256).as("d"))
      .collect()(0).getLong(0)
    assert(exactSmall == 100L) // fewer than k distinct: exact

    val big = (1 to 50000).flatMap(i => Seq(s"u$i", s"u$i")).toDF("x") // dups
    val est = big.agg(KMVSketch.approx_distinct_kmv($"x", k = 256).as("d"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 50000.0) / 50000.0 < 0.15, s"estimate $est")
    // deterministic: same input -> same estimate
    val est2 = big.agg(KMVSketch.approx_distinct_kmv($"x", k = 256).as("d"))
      .collect()(0).getLong(0)
    assert(est == est2)
  }

  test("mergeable across partitions and groups") {
    val df = (1 to 20000).map(i => (i % 4, s"user_${i % 5000}")).toDF("g", "u")
      .repartition(8)
    val out = df.groupBy($"g")
      .agg(KMVSketch.approx_distinct_kmv($"u", k = 128).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // each group sees 1250 distinct users
    out.values.foreach(d => assert(math.abs(d - 1250.0) / 1250.0 < 0.25, s"$out"))
    assert(out.size == 4)
  }
}
