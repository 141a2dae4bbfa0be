package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 100L, 200L),   // id, start, end
    (2L, 150L, 250L),   // overlaps 1
    (3L, 7200L, 7300L), // far bucket
    (4L, 500L, 500L)    // degenerate single-point interval
  ).toDF("iv_id", "s", "e")

  private val points = Seq(
    (10L, 100L),  // boundary: == start of 1
    (11L, 175L),  // inside 1 AND 2
    (12L, 250L),  // boundary: == end of 2
    (13L, 500L),  // hits the degenerate interval
    (14L, 7250L), // far bucket
    (15L, 300L)   // matches nothing
  ).toDF("p_id", "ts")

  test("matches equal the naive range join, boundaries closed") {
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ts", "s", "e", bucketWidth = 100L)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("ts") >= col("s") && col("ts") <= col("e"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L),
      (13L, 4L), (14L, 3L)))
  }

  test("result is invariant to bucket width") {
    val widths = Seq(1L, 7L, 1000L, 1000000L)
    val expected = IntervalJoin.pointInInterval(points, intervals,
        "ts", "s", "e", bucketWidth = 50L)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    widths.foreach { w =>
      val got = IntervalJoin.pointInInterval(points, intervals,
          "ts", "s", "e", bucketWidth = w)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got === expected, s"width $w")
    }
  }

  test("negative timestamps bucket by true floor division") {
    val iv = Seq((1L, -150L, -50L)).toDF("iv_id", "s", "e")
    val pts = Seq((10L, -100L), (11L, -151L), (12L, -50L))
      .toDF("p_id", "ts")
    val got = IntervalJoin.pointInInterval(pts, iv, "ts", "s", "e",
        bucketWidth = 100L)
      .select("p_id").as[Long].collect().toSet
    assert(got === Set(10L, 12L))
  }

  test("keyed join only matches within the key") {
    val iv = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "iv_id", "s", "e")
    val pts = Seq(("a", 10L, 50L)).toDF("k", "p_id", "ts")
    val got = IntervalJoin.pointInInterval(pts, iv, "ts", "s", "e",
        keys = Seq("k"), bucketWidth = 60L)
      .select("iv_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("inverted intervals are dropped; giant intervals fail fast") {
    val iv = Seq((1L, 200L, 100L)).toDF("iv_id", "s", "e")
    assert(IntervalJoin.pointInInterval(points, iv, "ts", "s", "e",
      bucketWidth = 10L).isEmpty)
    val giant = Seq((1L, 0L, 10000000L)).toDF("iv_id", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(points, giant, "ts", "s", "e",
        bucketWidth = 1L, maxBucketsPerInterval = 1000L).count()
    }
    assert(ex.getMessage.contains("buckets") ||
      ex.getCause != null && ex.getCause.getMessage.contains("buckets"))
  }

  test("rangeOverlap: closed-interval semantics, multi-bucket pairs " +
    "emit exactly once (first-common-bucket rule)") {
    val left = Seq((1L, 0L, 10L)).toDF("id_a", "sa", "ea")
    val right = Seq((2L, 5L, 8L), (3L, 10L, 12L), (4L, 11L, 15L))
      .toDF("id_b", "sb", "eb")
    val out = IntervalJoin.rangeOverlap(left, right, "sa", "ea",
        "sb", "eb", bucketWidth = 4L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // 1-2 overlaps across buckets 1 and 2 -> ONE row; 1-3 touches at
    // the closed endpoint 10; 1-4 starts after ea -> absent
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L)))
  }
}
