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

  test("all-zero weights apportion to zero on both engines (no NULLs, no error)") {
    val df = Seq(("a", 0L), ("b", 0L)).toDF("src", "w")
    val out = Apportion.largestRemainder(df, "src", "w", budget = 100L)
      .select($"src", $"base", $"rem", $"alloc")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a", 0L, 0L, 0L), ("b", 0L, 0L, 0L)))
    df.createOrReplaceTempView("apportion_zero__")
    val sql = Apportion
      .largestRemainderSql("apportion_zero__", "src", "w", budget = 100L)
      .replace("//", "div").replace("HUGEINT", "DECIMAL(38,0)")
    assert(spark.sql(sql).select($"alloc").as[Long].collect().toSeq ==
      Seq(0L, 0L))
  }

  test("selectToAllocation keeps each group's best rows within its share") {
    // group a: weights 300 total; group b: 100 total; budget 200
    // -> a gets 150, b gets 50 (exact proportions)
    val df = Seq(
      ("a", 1L, 100L, 9L), ("a", 2L, 100L, 8L), ("a", 3L, 100L, 7L),
      ("b", 4L, 40L, 9L), ("b", 5L, 40L, 8L), ("b", 6L, 20L, 7L)
    ).toDF("src", "id", "w", "quality")
    val out = Apportion.selectToAllocation(df, "src", "w",
        Seq(col("quality").desc, col("id").asc), budget = 200L)
      .select($"id").as[Long].collect().toSet
    // a (alloc 150): id 1 fits (100), id 2 would reach 200 > 150 - cut
    // b (alloc 50): id 4 fits (40), id 5 would reach 80 > 50 - cut
    assert(out == Set(1L, 4L))
    // partitioning independence
    val re = Apportion.selectToAllocation(df.repartition(5), "src", "w",
        Seq(col("quality").desc, col("id").asc), budget = 200L)
      .select($"id").as[Long].collect().toSet
    assert(re == out)
  }

  test("epochPlan: upsampled groups repeat; accounting is exact") {
    // weights 10/30 of 40, budget 200 -> allocs 50/150
    // a: 50 = 5 epochs of 10 + 0; b: 150 = 5 epochs of 30 + 0
    val even = Seq(("a", 10L), ("b", 30L)).toDF("src", "w")
    val out = Apportion.epochPlan(even, "src", "w", budget = 200L)
      .select($"src", $"alloc", $"full_epochs", $"partial_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map("a" -> ((50L, 5L, 0L)), "b" -> ((150L, 5L, 0L))))
    // uneven: budget 100 over 30/10 -> 75/25; a: 2x30+15, b: 2x10+5
    val out2 = Apportion.epochPlan(
        Seq(("a", 30L), ("b", 10L)).toDF("src", "w"), "src", "w", 100L)
      .select($"src", $"alloc", $"full_epochs", $"partial_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out2 == Map("a" -> ((75L, 2L, 15L)), "b" -> ((25L, 2L, 5L))))
    // invariant: alloc == full_epochs * weight + partial_tokens
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

  test("epochPlanSql mirrors epochPlan (Spark-eval bridge, incl. zero weight)") {
    val df = Seq(("a", 30L), ("b", 10L), ("z", 0L)).toDF("src", "w")
    df.createOrReplaceTempView("epoch_in__")
    val sql = Apportion
      .epochPlanSql("epoch_in__", "src", "w", budget = 100L)
      .replace("//", "div").replace("HUGEINT", "DECIMAL(38,0)")
    val a = Apportion.epochPlan(df, "src", "w", 100L)
    val b = spark.sql(sql)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
