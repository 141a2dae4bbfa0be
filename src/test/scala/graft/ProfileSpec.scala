package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columns: null/distinct accounting and string-rendered min/max") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("c"))
    ).toDF("k", "s")
    val out = Profile.columns(df, Seq("k", "s")).rowsSet
    assert(out == Set(
      Seq("k", 4L, 1L, 2L, "1", "3"),
      Seq("s", 4L, 1L, 3L, "a", "c")))
  }

  test("histogram: exact integer buckets, every value covered, counts sum") {
    // values 0..99 in 10 buckets: width (99-0) div 10 + 1 = 10
    val df = (0L until 100L).toDF("v")
    val out = Profile.histogram(df, "v", nBuckets = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 10)
    assert(out.map(_._4).sum == 100L)
    out.foreach { case (b, lo, hi, n) =>
      assert(lo == b * 10 && hi == lo + 9 && n == 10L)
    }
    // single value: one bucket holding everything
    val one = Profile.histogram(Seq(42L, 42L).toDF("v"), "v", 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(one.toSeq == Seq((0L, 42L, 42L, 2L)))
    // nulls excluded
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("v")
    assert(Profile.histogram(withNull, "v", 2)
      .agg(sum($"n_rows")).as[Long].head() == 2L)
  }
}
