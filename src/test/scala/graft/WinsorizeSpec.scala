package graft

import org.apache.spark.sql.functions._
import graft.operators.Winsorize

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  // group g: 0..100 in units; one wild outlier at 100000
  private val rows = ((0 to 100).map(i => ("g", i.toLong)) :+ ("g", 100000L))
    .toDF("grp", "units")

  test("clips to the exact type-7 quantile band; interior values pass through") {
    val out = Winsorize.clipToQuantiles(rows, Seq("grp"),
      col("units"), scale = 1L, pLow = 0.10, pHigh = 0.90)
    // n = 102; pos(0.10) = 10.1 -> lerp(10, 11, .1) = 10.1
    val lo = out.select("wins_lo").as[Double].head()
    assert(math.abs(lo - 10.1) < 1e-12)
    val clipped = out.filter(col("units") === 100000L)
      .select("wins_value").as[Double].head()
    val hi = out.select("wins_hi").as[Double].head()
    assert(clipped === hi)
    val mid = out.filter(col("units") === 50L)
      .select("wins_value").as[Double].head()
    assert(mid === 50.0)
    val low = out.filter(col("units") === 0L)
      .select("wins_value").as[Double].head()
    assert(low === lo)
  }

  test("groups clip independently") {
    val two = rows.union(Seq(("h", 5L), ("h", 6L), ("h", 7L))
      .toDF("grp", "units"))
    val out = Winsorize.clipToQuantiles(two, Seq("grp"),
      col("units"), 1L, 0.0, 1.0)
    // p0..p100 band: nothing clips in either group
    assert(out.filter(col("wins_value") =!=
      col("units").cast("double")).isEmpty)
    val hBounds = out.filter(col("grp") === "h")
      .select("wins_lo", "wins_hi").distinct()
      .as[(Double, Double)].head()
    assert(hBounds === ((5.0, 7.0)))
  }

  test("null metrics stay null, never become a bound") {
    val withNull = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", None))
      .toDF("grp", "units")
    val out = Winsorize.clipToQuantiles(withNull, Seq("grp"),
      col("units"), 1L, 0.25, 0.75)
    assert(out.filter(col("units").isNull)
      .select("wins_value").collect()(0).isNullAt(0))
  }

  test("NULL group key is a real group: its rows clip against its own bounds") {
    val rows = ((1 to 100).map(i => (null.asInstanceOf[String], i.toLong)) ++
      Seq(("g", 5L), ("g", 6L), ("g", 7L)))
      .toDF("grp", "units")
    val out = Winsorize.clipToQuantiles(rows, Seq("grp"), col("units"),
      scale = 1L, pLow = 0.10, pHigh = 0.90)
    val nullRows = out.filter(col("grp").isNull)
    assert(nullRows.count() === 100)
    // bounds must be the NULL group's own quantiles, and the extreme
    // values must actually clip (a null-unsafe join would pass them
    // through unclipped)
    val clippedLow = nullRows.filter(col("units") === 1L)
      .select("wins_value").as[Double].head()
    val lo = nullRows.select("wins_lo").as[Double].head()
    assert(clippedLow === lo)
    assert(lo > 1.0)
  }

  test("scalable path (range-partitioned rank) is value-equal to the window path") {
    // skewed: one big group with heavy ties + two small groups + nulls
    val data = ((1 to 2000).map(i => ("big", (i * 37 % 97).toLong)) ++
      (1 to 7).map(i => ("s1", i.toLong)) ++
      Seq(("s2", 42L))).toDF("grp", "units")
      .union(Seq(("s2", null.asInstanceOf[java.lang.Long]))
        .toDF("grp", "units"))
      .repartition(13)
    def run(scalable: Boolean) = Winsorize.clipToQuantiles(
      data, Seq("grp"), col("units"), scale = 1L,
      pLow = 0.05, pHigh = 0.95, scalable = scalable)
      .select("grp", "units", "wins_lo", "wins_hi", "wins_value")
      .collect().map(_.toSeq).toSet
    assert(run(scalable = false) === run(scalable = true))
    Caches.unpersistAll(blocking = true)
  }
}
