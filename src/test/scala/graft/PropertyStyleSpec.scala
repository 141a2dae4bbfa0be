package graft

import java.util.Locale
import org.apache.spark.sql.functions._
import graft.functions.Cleanse
import graft.operators.{PeerPercentile, WeightedScore}

/** Seeded property-style tests (SURVEY §5: property tests for the
  * cleansing parsers and percentile math). Cases are generated with a
  * fixed seed and evaluated in one DataFrame pass per property. */
class PropertyStyleSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("cleanNumber inverts locale formatting: commas, %, unicode minus, +") {
    val cases = (1 to 300).map { _ =>
      val d = math.rint(rnd.nextDouble() * 2e6 - 1e6) / 100 // 2dp in [-10k, 10k]
      val formatted = String.format(Locale.US, "%,.2f", Double.box(math.abs(d)))
      val s =
        if (d < 0) "−" + formatted + "%" // unicode minus + percent suffix
        else "+" + formatted
      (s, d)
    }
    val out = cases.toDF("s", "expected")
      .select(Cleanse.cleanNumber($"s").as("got"), $"expected")
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r))
  }

  test("volatility codec roundtrips 3dp values exactly") {
    val cases = (1 to 300).map { _ => math.rint(rnd.nextDouble() * 100000) / 1000 }
    val out = cases.toDF("v")
      .select($"v", Cleanse.volDecode(Cleanse.volEncode($"v")).as("rt"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r))
  }

  test("peer percentile: bounded in [0,100], monotone in value within a group") {
    val rows = (1 to 500).map { i =>
      (i.toLong, s"g${rnd.nextInt(8)}", rnd.nextInt(4),
        if (rnd.nextInt(10) == 0) None else Some(math.rint(rnd.nextDouble() * 1e4) / 100))
    }
    val df = rows.toDF("id", "seg", "nat", "v")
    val out = df.select($"id", $"seg", $"nat", $"v",
      PeerPercentile.percentile($"v", Seq($"seg", $"nat"), Seq($"seg")).as("p"))
      .collect()
      .map(r => (r.getString(1), r.getInt(2), Option(r.get(3)), Option(r.get(4))))
    out.foreach {
      case (_, _, Some(_), Some(p: Double)) => assert(p >= 0.0 && p <= 100.0)
      case (_, _, None, p) => assert(p.isEmpty) // null value -> null pct
      case (_, _, Some(_), None) => fail("non-null value must score")
    }
    // monotone: within any (seg,nat) group, sort by value; pct non-decreasing
    out.filter(_._3.isDefined).groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._3.get.asInstanceOf[Double])
        .map(_._4.get.asInstanceOf[Double]).toSeq
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a <= b + 1e-9)
      }
    }
  }

  test("connected components equals driver union-find on random graphs") {
    // differential oracle: a classic path-compressed union-find over the
    // same random edge lists must produce identical min-id components
    for (trial <- 1 to 5) {
      val nNodes = 30 + rnd.nextInt(50)
      val nEdges = 10 + rnd.nextInt(60)
      val edges = (1 to nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: $nNodes nodes, $nEdges edges")
    }
  }

  test("renormalized weighted average stays within the span of present metrics") {
    val rows = (1 to 300).map { _ =>
      def m = if (rnd.nextInt(4) == 0) None else Some(rnd.nextDouble() * 100)
      (m, m, m)
    }
    val df = rows.toDF("a", "b", "c")
    val out = df.select($"a", $"b", $"c",
      WeightedScore.renormalizedWeightedAvg(Seq(
        $"a" -> 0.5, $"b" -> 0.3, $"c" -> 0.2)).as("w"))
      .collect()
    out.foreach { r =>
      val present = Seq(0, 1, 2).flatMap(i => Option(r.get(i)).map(_.asInstanceOf[Double]))
      Option(r.get(3)).map(_.asInstanceOf[Double]) match {
        case None => assert(present.isEmpty)
        case Some(w) =>
          assert(w >= present.min - 1e-9 && w <= present.max + 1e-9)
      }
    }
  }
}
