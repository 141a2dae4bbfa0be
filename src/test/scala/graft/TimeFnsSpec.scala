package graft

import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Pins [[TimeFns.floorDiv]] to FLOOR (DuckDB `//`) semantics — the
  * divergence it exists to prevent only shows on negative dividends,
  * which no current corpus contains, so without this fixture a
  * regression back to truncating `div` would pass every oracle gate
  * until a regenerated corpus draws a pre-1970 timestamp. */
class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("floorDiv floors negative dividends like DuckDB //, unlike div") {
    val vals = Seq(-7L, -6L, -1L, 0L, 1L, 5L, 6L, 7L,
      -1800L * 1000000000L, 1800L * 1000000000L)
    val rows = vals.toDF("v")
      .select($"v", TimeFns.floorDiv($"v", 3L).as("fd3"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(rows(v) == Math.floorDiv(v, 3L),
        s"floorDiv($v, 3) must floor, got ${rows(v)}")
    }
    // the motivating case: 30 min before epoch lands in hour -3600,
    // not hour 0 (truncating div would bucket it high)
    val hour = Seq(-1800L * 1000000000L).toDF("ts")
      .select((TimeFns.floorDiv(
        TimeFns.floorDiv($"ts", 1000000000L), 3600L) * 3600L).as("h"))
      .head().getLong(0)
    assert(hour == -3600L)
  }

  test("floorDiv equals div on the non-negative domain") {
    val vals = Seq(0L, 1L, 999999999L, 1000000000L, 1000000001L,
      86400L * 1000000000L - 1L)
    val rows = vals.toDF("v")
      .select($"v", TimeFns.floorDiv($"v", 86400L).as("fd"),
        expr("v div 86400").as("dv"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"floorDiv and div must agree at ${r.getLong(0)}"))
  }
}
