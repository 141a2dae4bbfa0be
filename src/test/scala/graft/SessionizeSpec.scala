package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // user 1: events at 0s, 100s, 2500s (gap > 1800 -> new session), 2600s
  // user 2: single event
  private val events = Seq(
    (1L, 10L, 0L, 1.0), (2L, 10L, 100L, 2.0),
    (3L, 10L, 2500L, 3.0), (4L, 10L, 2600L, 4.0),
    (5L, 20L, 50L, 5.0)
  ).toDF("event_id", "user_id", "ts_s", "value")

  test("gap sessionization splits on gap > threshold") {
    val out = Sessionize.sessions(events, "user_id", $"ts_s", 1800L, $"event_id")
      .select($"event_id", $"session_seq").rowsSet
    assert(out == Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 2L), Seq(5L, 1L)))
  }

  test("sessionStats aggregates per session") {
    val out = Sessionize.sessionStats(events, "user_id", $"ts_s", 1800L,
      $"event_id", "value").rowsSet
    assert(out == Set(
      Seq(10L, 1L, 2L, 100L, 3.0),
      Seq(10L, 2L, 2L, 100L, 7.0),
      Seq(20L, 1L, 1L, 0L, 5.0)))
  }

  test("tumbling windows bucket by integer time") {
    val out = Sessionize.tumbling(events, $"ts_s", 3600L,
      Seq($"user_id"), $"value").rowsSet
    // all five events fall in bucket 0 (2600 < 3600)
    assert(out == Set(Seq(0L, 10L, 4L, 10.0), Seq(0L, 20L, 1L, 5.0)))
  }
}
