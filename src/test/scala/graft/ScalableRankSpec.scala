package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ScalableRank

/** The distributed rank/percentile must be value-identical to the window
  * formulations on data with ties, nulls, skew, and multiple groups. */
class ScalableRankSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(7)
    (1 to 2000).map { i =>
      val g = if (rnd.nextInt(10) < 6) "hot" else s"g${rnd.nextInt(5)}" // skew
      val v = if (rnd.nextInt(8) == 0) None
        else Some((rnd.nextInt(50) * 10).toDouble) // heavy ties
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
  }

  test("groupRank equals window rank() under ties, nulls, and skew") {
    val df = fixture
    val windowRank = df.withColumn("expected",
      rank().over(Window.partitionBy($"g").orderBy($"v".asc_nulls_first))
        .cast("long"))
    val scalable = ScalableRank.groupRank(df, Seq("g"), "v", "got")
    val joined = windowRank.join(scalable.select($"id", $"got"), "id")
    assert(joined.filter($"expected" =!= $"got").isEmpty)
    assert(scalable.count() == 2000)
  }

  test("q06's declared plan has no single-partition exchange") {
    // the scalable banding must never funnel all rows through one task —
    // a regression back to the un-partitioned window form would show as
    // Exchange SinglePartition in the physical plan
    val q06 = SparkEntry.queries("q06_band_by_balance")(
      spark, "/root/testdata/sf0.001")
    val plan = q06.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in q06 plan:\n$plan")
    // ... and stays in Tungsten: the offset/position passes must not
    // round-trip through an RDD (Scan ExistingRDD = Row materialization)
    assert(!plan.contains("ExistingRDD"),
      s"RDD round-trip in q06 plan:\n$plan")
    assert(q06.count() > 0)
  }

  test("groupRank survives rows ≪ partitions (empty range partitions)") {
    // repartitionByRange on 3 rows leaves most shuffle partitions empty;
    // the offset aggregate sees no row for them and the scan positions
    // must still be globally consecutive
    val tiny = Seq((1L, "a", Some(10.0)), (2L, "a", Some(10.0)),
      (3L, "a", Some(5.0))).toDF("id", "g", "v")
    val got = ScalableRank.groupRank(tiny, Seq("g"), "v", "r")
      .select($"id", $"r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L)) // ties share first pos
  }

  test("groupPercentile equals the window strict-percentile") {
    val df = fixture
    val expected = df.select($"id",
      graft.operators.PeerPercentile.percentile($"v", Seq($"g"), Seq($"g"),
        minPeers = 1, includeGlobal = false).as("expected"))
    val got = ScalableRank.groupPercentile(df, Seq("g"), "v", "got")
      .select($"id", $"got")
    val joined = expected.join(got, "id")
    assert(joined.filter(
      !($"expected" <=> $"got")).isEmpty)
  }
}
