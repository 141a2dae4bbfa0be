package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("leftAsOf picks latest right row at or before left ts, null when none") {
    val trades = Seq(
      (1L, "A", 100L, 10.0), // quotes at 90, 95 -> pick 95
      (2L, "A", 95L, 11.0),  // quote exactly at 95 -> equality matches
      (3L, "A", 80L, 12.0),  // before all quotes -> null
      (4L, "B", 50L, 13.0)   // other key, quote at 40
    ).toDF("trade_id", "sym", "ts", "price")
    val quotes = Seq(
      ("A", 90L, 1.5), ("A", 95L, 1.7), ("A", 120L, 2.0), ("B", 40L, 9.9)
    ).toDF("sym", "ts", "bid")
    val out = AsOfJoin.leftAsOf(trades, quotes, Seq("sym"), "ts", "ts",
      rightPayload = Seq("bid", "ts"))
      .select($"trade_id", $"right_bid", $"right_ts")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) == ((Some(1.7), Some(95L))))
    assert(out(2L) == ((Some(1.7), Some(95L)))) // ts equality included
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((Some(9.9), Some(40L))))
  }

  test("row-wise carry: a null right column does not mix rows") {
    val left = Seq((1L, "A", 100L)).toDF("id", "k", "ts")
    val right = Seq(("A", 10L, Some(5.0), Some("old")),
      ("A", 90L, None, Some("new"))).toDF("k", "ts", "v", "tag")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts",
      rightPayload = Seq("v", "tag")).collect()(0)
    // latest ROW (ts 90) wins as a unit: v null, tag "new"
    assert(out.getAs[Any]("right_v") == null)
    assert(out.getAs[String]("right_tag") == "new")
  }

  test("leftAsOfNearest: picks the closer side, ties go backward, " +
    "equal ts matches backward at distance 0, no-match null-extends") {
    val left = Seq((10L, "A", 10L), (11L, "A", 25L), (12L, "A", 30L),
      (13L, "A", 20L), (14L, "B", 5L)).toDF("id", "k", "ts")
    val right = Seq(("A", 8L, 108L), ("A", 20L, 120L), ("A", 40L, 140L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.leftAsOfNearest(left, right, Seq("k"), "ts",
        "ts", rightPayload = Seq("rid")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[Any]("right_rid")),
          Option(r.getAs[Any]("matched_back"))))).toMap
    assert(out(10L) == ((Some(108L), Some(true))))  // d 2 back vs 10 fwd
    assert(out(11L) == ((Some(120L), Some(true))))  // d 5 back vs 15 fwd
    assert(out(12L) == ((Some(120L), Some(true))))  // 10 vs 10: tie back
    assert(out(13L) == ((Some(120L), Some(true))))  // exact ts: d 0 back
    assert(out(14L) == ((None, None)))              // key B: no rights
  }
}
