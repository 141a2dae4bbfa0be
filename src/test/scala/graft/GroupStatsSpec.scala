package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupStats

class GroupStatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect linear relation gives r = 1; anti-linear gives r = -1") {
    val up = (1 to 50).map(i => ("up", i.toLong, 3L * i + 7))
    val down = (1 to 50).map(i => ("down", i.toLong, -2L * i + 200))
    val out = GroupStats.pearson(
      (up ++ down).toDF("grp", "x", "y"), Seq("grp"), col("x"), col("y"))
      .select("grp", "r").as[(String, Double)].collect().toMap
    assert(out("up") === 1.0)
    assert(out("down") === -1.0)
  }

  test("independent-ish data lands near zero; matches a driver-side computation") {
    val rows = (1 to 200).map { i =>
      val x = (i * 2654435761L) % 101
      val y = (i * 40503L) % 97
      ("g", x, y)
    }
    val got = GroupStats.pearson(rows.toDF("grp", "x", "y"),
      Seq("grp"), col("x"), col("y"))
      .select("r").as[Double].head()
    val n = rows.size.toDouble
    val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum
    val den = math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
      math.sqrt(n * ys.map(a => a * a).sum - ys.sum * ys.sum)
    assert(math.abs(got - num / den) < 1e-6)
  }

  test("zero variance yields NULL r, not 0; result partition-invariant") {
    val rows = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L))
      .toDF("grp", "x", "y")
    val out = GroupStats.pearson(rows, Seq("grp"), col("x"), col("y"))
    assert(out.select("r").collect()(0).isNullAt(0))
    val big = (1 to 1000).map(i => ("g", (i % 37).toLong, (i % 11).toLong))
      .toDF("grp", "x", "y")
    val a = GroupStats.pearson(big, Seq("grp"), col("x"), col("y"))
      .select("r").as[Double].head()
    val b = GroupStats.pearson(big.repartition(17), Seq("grp"),
      col("x"), col("y")).select("r").as[Double].head()
    assert(a === b) // exact accumulators: bit-equal, not approximately
  }
}
