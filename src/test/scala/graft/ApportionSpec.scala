package graft

import org.apache.spark.sql.functions._
import graft.operators.Apportion

class ApportionSpec extends SparkSpec {
  import spark.implicits._

  test("allocations sum exactly to the budget and follow proportions") {
    val rows = Seq.fill(10)(("a", 30L)) ++ Seq.fill(10)(("b", 20L)) ++
      Seq.fill(10)(("c", 10L))
    val df = rows.toDF("src", "w")
    val out = Apportion.largestRemainder(df, "src", "w", budget = 100L)
      .select($"src", $"alloc").as[(String, Long)].collect().toMap
    // weights 300/200/100 of 600 -> exactly 50/33.33/16.67 of 100
    assert(out == Map("a" -> 50L, "b" -> 33L, "c" -> 17L))
    assert(out.values.sum == 100L)
  }

  test("largest remainders win the +1s; ties break by group name asc") {
    // weights 1,1,1 with budget 100: base 33 each, extra 1 -> all
    // remainders equal (100·1 mod 3 = 1) -> 'a' gets the +1
    val df = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("src", "w")
    val out = Apportion.largestRemainder(df, "src", "w", budget = 100L)
      .select($"src", $"alloc").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 34L, "b" -> 33L, "c" -> 33L))
  }

  test("zero-weight groups get zero; result is partitioning-independent") {
    val df = (1 to 400).map(i => (s"s${i % 7}", if (i % 7 == 0) 0L else i.toLong))
      .toDF("src", "w")
    val a = Apportion.largestRemainder(df, "src", "w", 12345L)
    val b = Apportion.largestRemainder(df.repartition(13), "src", "w", 12345L)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val byName = a.select($"src", $"alloc").as[(String, Long)].collect().toMap
    assert(byName("s0") == 0L)
    assert(byName.values.sum == 12345L)
  }

  test("SQL mirror computes the identical allocation (Spark-eval bridge)") {
    val df = Seq(("a", 37L), ("b", 23L), ("c", 11L), ("d", 5L))
      .toDF("src", "w")
    df.createOrReplaceTempView("apportion_in__")
    val sql = Apportion
      .largestRemainderSql("apportion_in__", "src", "w", budget = 1000L)
      .replace("//", "div").replace("HUGEINT", "DECIMAL(38,0)")
    val a = Apportion.largestRemainder(df, "src", "w", 1000L)
    val b = spark.sql(sql)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
