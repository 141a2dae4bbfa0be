package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, EventAnalytics, FuzzyJoin, SnapshotDiff}

/** Round-11 batch 2: snapshot diff, rolling daily metrics,
  * sorted-neighborhood linkage, forward as-of. */
class Round11bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed/unchanged with " +
    "per-column attribution") {
    val old = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "name", "bal")
    val neu = Seq((2L, "B", 25.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "name", "bal")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("name", "bal"))
    assert(out.rowsSet == Set(
      Seq(1L, "removed", 0L, ""),
      Seq(2L, "changed", 1L, "bal"),
      Seq(3L, "unchanged", 0L, ""),
      Seq(4L, "added", 0L, "")))
  }

  test("snapshot diff is null-safe per column") {
    val old = Seq((1L, Some("A")), (2L, None: Option[String]))
      .toDF("k", "name")
    val neu = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("k", "name")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("name"))
    assert(out.rowsSet == Set(
      Seq(1L, "changed", 1L, "name"),   // value -> null IS a change
      Seq(2L, "unchanged", 0L, "")))    // null -> null is not
  }

  test("rolling daily metrics: trailing frame counts OBSERVED days only") {
    val day = 86400L * 1000000000L
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(6)(3L))
      .map(d => ("t", d * day)).toDF("event_type", "ts")
    val out = EventAnalytics.rollingDailyMetrics(ev, "event_type", "ts",
      windowRows = 2)
    assert(out.rowsSet == Set(
      Seq("t", 0L, 2L, 2L, 20000L),
      Seq("t", 1L, 4L, 6L, 30000L),
      Seq("t", 3L, 6L, 10L, 50000L)))  // gap day 2 does NOT dilute
  }

  test("sorted neighborhood pairs lexicographic neighbors only") {
    val df = Seq((1L, "aaa1"), (2L, "aaa2"), (3L, "aaa3"), (4L, "zzz"))
      .toDF("k", "nm")
    val out = FuzzyJoin.sortedNeighborhood(df, "k", "nm",
      windowSize = 2, maxDist = 1, minDist = 1)
    assert(out.rowsSet.map(r => (r(0), r(1), r(4))) == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    graft.Caches.unpersistAll()
  }

  test("forward as-of picks the EARLIEST right at ts >= left, ties ok") {
    val clicks = Seq((100L, 1L, 5L), (101L, 1L, 7L), (102L, 1L, 12L))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((1L, 7L, 900L), (1L, 10L, 901L))
      .toDF("user_id", "ts", "purchase_event_id")
    val out = AsOfJoin.leftAsOfForward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("purchase_event_id"))
      .select($"event_id", $"right_purchase_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(100L -> Some(900L), 101L -> Some(900L),
      102L -> None))
  }
}
