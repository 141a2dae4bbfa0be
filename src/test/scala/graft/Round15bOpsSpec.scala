package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-15 second-wave operator semantics: t-closeness EMD,
  * best-neighbor 1-NN edges, common-neighbor link prediction — each
  * against a hand-computed fixture. */
class Round15bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tCloseness: ordered EMD vs the global distribution, exact " +
    "e6 half-up") {
    // Class A values [1,1,2], class B [2,3,3,3]; global v1:2 v2:2
    // v3:3, N=7, m=3. cumA = 2,3,3; cumB = 0,1,4; global cum 2,4,7.
    // dev_A = |2*7-2*3| + |3*7-4*3| + 0 = 17 -> 17/(3*7*2) = 404762
    // dev_B = |0*7-2*4| + |1*7-4*4| + 0 = 17 -> 17/(4*7*2) = 303571
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L),
      ("B", 3L), ("B", 3L), ("B", 3L)).toDF("q", "v")
    val got = PrivacyAudit.tCloseness(df, Seq("q"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("A") == (3L, 404762L))
    assert(got("B") == (4L, 303571L))
  }

  test("tCloseness: a single global value (m = 1) reads 0 by the " +
    "zero-denominator convention") {
    val df = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("q", "v")
    val got = PrivacyAudit.tCloseness(df, Seq("q"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("A" -> 0L, "B" -> 0L))
  }

  test("bestNeighborEdges: per-node argmax with smallest-id ties, " +
    "canonical distinct edges") {
    val pairs = Seq((1L, 2L, 9000L), (1L, 3L, 9000L), (4L, 5L, 5000L))
      .toDF("a", "b", "s")
    val got = GraphRank.bestNeighborEdges(pairs, "a", "b", col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // node 1 ties (2,3) -> 2; nodes 2 and 3 both pick 1; 4<->5
    assert(got == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("linkPrediction: only NON-adjacent wedge pairs emit, with " +
    "the exact neighborhood Jaccard") {
    // Edges {12,13,14,23}: open wedge pairs are (2,4) and (3,4),
    // each with 1 common neighbor (node 1); J = 1/(2+1-1) = 0.5.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("a", "b")
    val got = GraphRank.linkPrediction(e, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == Set((2L, 4L), (3L, 4L)))
    assert(got((2L, 4L)) == (1L, 2L, 1L, 500000L))
    assert(got((3L, 4L)) == (1L, 2L, 1L, 500000L))
  }

  test("rollingSlope: 2-row window Cramer slope, 1-row windows read " +
    "0 by the zero-denominator convention") {
    val day = 86400L * 1000000000L
    // type a: day1 x1, day2 x3, day4 x5 -> slopes 0, 2e6, 1e6
    val ev = (Seq.fill(1)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(5)(4L))
      .map(d => ("a", d * day)).toDF("t", "ts")
    val got = EventAnalytics.rollingSlope(ev, "t", "ts",
        windowRows = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (1L, 1L, 0L))
    assert(got(2L) == (3L, 2L, 2000000L))
    assert(got(4L) == (5L, 2L, 1000000L))
  }

  test("rollingSlope: decreasing counts give a NEGATIVE signed slope") {
    val day = 86400L * 1000000000L
    val ev = (Seq.fill(5)(1L) ++ Seq.fill(1)(2L))
      .map(d => ("a", d * day)).toDF("t", "ts")
    val got = EventAnalytics.rollingSlope(ev, "t", "ts", windowRows = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(got(2L) == -4000000L)
  }

  test("densifyDaily: calendar gaps zero-fill, carry skips " +
    "null-valued observed days, never-observed reads -1/null") {
    val day = 86400L * 1000000000L
    val ev = Seq(
      ("a", 1L * day, Some(5.0)), ("a", 1L * day, Some(2.0)),
      ("a", 3L * day, None), ("b", 4L * day, Some(7.0)))
      .toDF("t", "ts", "v")
    val got = EventAnalytics.densifyDaily(ev, "t", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(got.size == 8) // 2 types x days 1..4
    assert(got(("a", 1L)) == (2L, true, 0L, Some(5.0)))
    assert(got(("a", 2L)) == (0L, false, 1L, Some(5.0)))
    // day 3 observed but its max(v) is null -> carry stays 5.0
    assert(got(("a", 3L)) == (1L, true, 0L, Some(5.0)))
    assert(got(("a", 4L)) == (0L, false, 1L, Some(5.0)))
    assert(got(("b", 1L)) == (0L, false, -1L, None))
    assert(got(("b", 4L)) == (1L, true, 0L, Some(7.0)))
  }

  test("rankBiasedOverlap: identical, reversed, and single-item " +
    "rankings at p = 1/2 match the closed forms") {
    // identical 3-item rankings at depth 3: 1 - p^3 = 0.875
    val same = Seq((1L, 3L, 3L), (2L, 2L, 2L), (3L, 1L, 1L))
      .map { case (i, a, b) => ("g", i, a, b) }
      .toDF("g", "id", "sa", "sb")
    val r1 = EvalMetrics.rankBiasedOverlap(same, "g", "id",
      col("sa"), col("sb"), depth = 3, pNum = 1L, pDen = 2L).collect()
    assert(r1.length == 1 &&
      (r1(0).getLong(1), r1(0).getLong(2)) == (3L, 875000L))
    // reversed: ov = 0,1,3 -> 0 + 125000 + 125000
    val rev = Seq((1L, 3L, 1L), (2L, 2L, 2L), (3L, 1L, 3L))
      .map { case (i, a, b) => ("g", i, a, b) }
      .toDF("g", "id", "sa", "sb")
    val r2 = EvalMetrics.rankBiasedOverlap(rev, "g", "id",
      col("sa"), col("sb"), depth = 3, pNum = 1L, pDen = 2L).collect()
    assert(r2(0).getLong(2) == 250000L)
    // single item: ov_d = 1 -> 500000 + 125000 + 41666 (floored)
    val one = Seq(("g", 1L, 9L, 9L)).toDF("g", "id", "sa", "sb")
    val r3 = EvalMetrics.rankBiasedOverlap(one, "g", "id",
      col("sa"), col("sb"), depth = 3, pNum = 1L, pDen = 2L).collect()
    assert((r3(0).getLong(1), r3(0).getLong(2)) == (1L, 666666L))
  }

  test("otsuCard: bimodal split maximizes between-class variance " +
    "exactly; all-right thresholds are excluded") {
    // pixels [0,0,10,10]: threshold 0 -> sigma_B = .25*100 = 25
    val px = Seq((1L, 0L), (1L, 0L), (1L, 10L), (1L, 10L))
      .toDF("doc_id", "l")
    val got = Multimodal.otsuCard(px, "doc_id", "l").collect()(0)
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == (4L, 0L, 2L, 25L))
    // uniform image: every split has an empty right class -> no row
    val flat = Seq((2L, 7L), (2L, 7L)).toDF("doc_id", "l")
    assert(Multimodal.otsuCard(flat, "doc_id", "l").count() == 0L)
  }

  test("positionAttribution: 40/20/40 with floored middle shares; " +
    "1- and 2-touch conversions use the degenerate splits") {
    val ev = Seq(
      ("u", 10L, 1L, "view"), ("u", 20L, 2L, "view"),
      ("u", 30L, 3L, "view"), ("u", 100L, 10L, "purchase"),
      ("v", 10L, 4L, "view"), ("v", 20L, 5L, "view"),
      ("v", 100L, 11L, "purchase"),
      ("w", 10L, 6L, "view"), ("w", 100L, 12L, "purchase"))
      .toDF("u", "ts", "id", "t")
    val got = EventAnalytics.positionAttribution(ev, "u", "ts", "id",
        "t", "view", "purchase", windowNanos = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((10L, 1L)) == (1L, 3L, 400000L))
    assert(got((10L, 2L)) == (2L, 3L, 200000L))
    assert(got((10L, 3L)) == (3L, 3L, 400000L))
    assert(got((11L, 4L)) == (1L, 2L, 500000L))
    assert(got((11L, 5L)) == (2L, 2L, 500000L))
    assert(got((12L, 6L)) == (1L, 1L, 1000000L))
  }

  test("weightedPageRank: one round splits rank mass by weight, " +
    "floor per edge") {
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("s", "d", "w")
    val got = GraphRank.weightedPageRank(e, "s", "d", "w",
        iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contrib b = (1e6*3)//4 = 750000 -> (15e6+85*750000)//100
    assert(got == Map(1L -> 150000L, 2L -> 787500L, 3L -> 362500L))
  }

  test("mannKendall: signed pair sum with ties contributing 0, " +
    "exact tau-a") {
    val day = 86400L * 1000000000L
    val ev = (Seq.fill(1)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L))
      .map(d => ("a", d * day)).toDF("t", "ts")
    val r = EventAnalytics.mannKendall(ev, "t", "ts").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 2L, 666667L))
  }

  test("rendezvousAssign: shards in range, deterministic, and " +
    "k->k+1 moves keys ONLY to the new shard") {
    val d = spark.range(1000L).toDF("id")
    val a = ShardExport.rendezvousAssign(d, "id", 4, "s4")
    val both = ShardExport.rendezvousAssign(a, "id", 5, "s5")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(both.forall { case (s4, s5) => s4 >= 0 && s4 < 4 &&
      s5 >= 0 && s5 < 5 })
    // HRW minimal movement: a changed assignment can only be a win
    // by the newly added shard 4
    assert(both.filter { case (s4, s5) => s4 != s5 }
      .forall(_._2 == 4L))
    // and the new shard takes roughly 1/5 (binomial, loose bounds)
    val moved = both.count(_._2 == 4L)
    assert(moved > 100 && moved < 300)
  }

  test("exactSplit: per-stratum counts are exactly the floored " +
    "quotas, including starved small strata") {
    val rows = (1 to 10).map(i => ("x", i.toLong)) ++
      (1 to 3).map(i => ("y", 100L + i))
    val got = Sampling.exactSplit(rows.toDF("st", "k"), "st", "k",
        Seq(8, 1, 1), Seq("train", "val", "test"))
      .groupBy("st", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(got(("x", "train")) == 8L && got(("x", "val")) == 1L &&
      got(("x", "test")) == 1L)
    // m=3: train = 24//10 = 2, val = 27//10 - 2 = 0, test = 1
    assert(got(("y", "train")) == 2L && got(("y", "test")) == 1L &&
      !got.contains(("y", "val")))
  }

  test("stupidBackoff: the three-level ladder scores trigram, " +
    "bigram, unigram hits and counts OOV") {
    val ref = Seq("a b c a b d").toDF("text")
      .withColumn("doc_id", lit(0L))
    val scored = Seq((1L, "a b c x"), (2L, "x a b"), (3L, "zz"))
      .toDF("doc_id", "text")
    val got = NgramLm.stupidBackoff(ref, scored, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc1: (a,b,c) l3 = c123/c12 = 1/2; (b,c,x) full miss
    assert(got(1L) == (2L, 500000L, 1L, 0L, 0L, 1L))
    // doc2: (x,a,b) l2 = 0.4 * c23(a,b)/c2(a) = 0.4 * 2/2
    assert(got(2L) == (1L, 400000L, 0L, 1L, 0L, 0L))
    // doc3: under 3 words -> zero row
    assert(got(3L) == (0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("textPngPayloads: identical 96-char prefixes survive the " +
    "real PNG roundtrip to identical dHash fingerprints") {
    val base = "The quick brown fox jumps over the lazy dog! " * 3
    val d = Seq((1L, base), (2L, base + "DIFFERENT TAIL"),
      (3L, base.toUpperCase)).toDF("doc_id", "text")
    val fps = Multimodal.dhashFingerprints(
        Multimodal.textPngPayloads(d, "doc_id", "text"),
        "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 3)
    // docs 1 and 2 share the first 96 chars -> same pixels -> same fp
    assert(fps(1L) == fps(2L))
  }

  test("tokenMovers: add-1 smoothed cross-rate with zero-filled " +
    "sides, both directions totally ordered") {
    val a = Seq("x x y").toDF("text")
    val b = Seq("y z").toDF("text")
    // Na=3, Nb=2, V=3: x -> 3*5/(1*6)=2.5e6; y -> 2*5/(2*6)=833333;
    // z -> 1*5/(2*6)=416667
    val got = Drift.tokenMovers(a, b, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("a_heavy", "x")) == (2L, 0L, 2500000L))
    assert(got(("a_heavy", "y")) == (1L, 1L, 833333L))
    assert(got(("b_heavy", "z")) == (0L, 1L, 416667L))
    assert(got(("b_heavy", "y")) == (1L, 1L, 833333L))
  }

  test("fanoFactor: variance-to-mean over observed days, constant " +
    "series reads 0") {
    val day = 86400L * 1000000000L
    val ev = ((Seq.fill(1)(1L) ++ Seq.fill(3)(2L)).map(d => ("a", d)) ++
      (Seq.fill(2)(1L) ++ Seq.fill(2)(2L)).map(d => ("b", d)))
      .map { case (t, d) => (t, d * day) }.toDF("t", "ts")
    val got = EventAnalytics.fanoFactor(ev, "t", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: counts [1,3] -> (2*10-16)/(2*4) = 0.5
    assert(got("a") == (2L, 4L, 500000L))
    assert(got("b") == (2L, 4L, 0L))
  }

  test("HilbertLayout: the canonical 4x4 curve — bijection, known " +
    "corners, and every consecutive pair grid-adjacent") {
    val pts = for { x <- 0 to 3; y <- 0 to 3 }
      yield (x.toDouble, y.toDouble)
    val got = HilbertLayout.assign(pts.toDF("a", "b"), "a", "b",
        bits = 2)
      .collect().map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt)
        -> r.getLong(2)).toMap
    assert(got.values.toSet == (0L to 15L).toSet)
    assert(got((0, 0)) == 0L && got((1, 0)) == 1L &&
      got((1, 1)) == 2L && got((0, 1)) == 3L)
    assert(got((3, 0)) == 15L && got((0, 3)) == 5L &&
      got((3, 3)) == 10L)
    val byD = got.map(_.swap)
    // the Hilbert property Morton lacks: consecutive indexes are
    // always grid neighbors (Manhattan distance 1)
    assert((0 to 14).forall { i =>
      val (x1, y1) = byD(i.toLong); val (x2, y2) = byD(i.toLong + 1)
      (x1 - x2).abs + (y1 - y2).abs == 1
    })
  }

  test("maxDrawdown: running peak, (dd DESC, day ASC) argmax") {
    val d = Seq((1L, 10L), (2L, 20L), (3L, 5L), (4L, 15L))
      .map { case (dy, v) => ("g", dy, v) }.toDF("g", "dy", "v")
    val got = TechnicalIndicators.maxDrawdown(d, Seq("g"), col("dy"),
      col("v")).collect()(0)
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) == (4L, 15L, 3L, 20L, 5L))
  }

  test("rsiSimple: windowed gain share over deltas, first day " +
    "emits no row") {
    val d = Seq((1L, 10L), (2L, 20L), (3L, 5L), (4L, 15L))
      .map { case (dy, v) => ("g", dy, v) }.toDF("g", "dy", "v")
    val got = TechnicalIndicators.rsiSimple(d, Seq("g"), col("dy"),
        col("v"), window = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 3 && !got.contains(1L))
    assert(got(2L) == (10L, 1L, 1000000L))
    assert(got(3L) == (-15L, 2L, 400000L)) // 10/(10+15)
    assert(got(4L) == (10L, 2L, 400000L))
  }

  test("bollingerBreakouts: the squared 2-sigma test flags the jump " +
    "(a single outlier needs window >= 6 to clear z = 2)") {
    val vals = Seq.fill(6)(10L) :+ 30L
    val d = vals.zipWithIndex
      .map { case (v, i) => ("g", (i + 1).toLong, v) }
      .toDF("g", "dy", "v")
    val got = TechnicalIndicators.bollingerBreakouts(d, Seq("g"),
      col("dy"), col("v"), window = 6).collect()(0)
    // day 7's window [10 x5, 30]: dev^2 = 10000 > 4*(6*1400-6400)
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (7L, 1L, 0L))
  }

  test("vwapDaily: exact e4 extended/qty ratio per day") {
    val d = Seq((1L, 100L, 2L), (1L, 50L, 1L), (2L, 10L, 3L))
      .toDF("dy", "pq", "q")
    val got = TechnicalIndicators.vwapDaily(d, col("dy"), col("pq"),
        col("q"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) == (2L, 150L, 3L, 500000L))
    assert(got(2L) == (1L, 10L, 3L, 33333L))
  }

  test("leadLagScan: a series shifted by exactly 2 days reads " +
    "r2 = +1e6 at lag 2") {
    val day = 86400L * 1000000000L
    val pat = Seq(1, 3, 1, 1, 3, 1)
    val ev = (pat.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("view", (i + 1).toLong * day)) } ++
      pat.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(("purchase", (i + 3).toLong * day)) })
      .toDF("t", "ts")
    val got = EventAnalytics.leadLagScan(ev, "t", "ts", "view",
        "purchase", maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.size == 7)
    assert(got(2L) == (6L, 1000000L))
    assert(got(0L)._2 < 1000000L && got(-2L)._2 < 1000000L)
  }

  test("seasonalNaiveBacktest: day-7 predictor over the zero-filled " +
    "horizon, exact MAE and WAPE") {
    val day = 86400L * 1000000000L
    val counts = Seq(2, 1, 2, 1, 2, 1, 2, 1, 2)
    val ev = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("a", (i + 1).toLong * day)) }.toDF("t", "ts")
    val got = EventAnalytics.seasonalNaiveBacktest(ev, "t", "ts")
      .collect()(0)
    // eval days 8, 9: errors |1-2| and |2-1|; actuals 1 + 2
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) == (2L, 2L, 3L, 10000L, 666667L))
  }

  test("property: round-15 score surfaces stay in their declared " +
    "ranges on seeded random inputs") {
    val rnd = new scala.util.Random(15)
    // tCloseness EMD in [0, 1e6]
    val priv = (1 to 400).map(_ => (s"q${rnd.nextInt(6)}",
      rnd.nextInt(12).toLong)).toDF("q", "v")
    PrivacyAudit.tCloseness(priv, Seq("q"), col("v"))
      .collect().foreach { r =>
        assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L, r) }
    // RBO_min in [0, 1e6] and never exceeds the identical-ranking sum
    val rbo = (1 to 300).map(i => (s"g${rnd.nextInt(5)}", i.toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("g", "id", "sa", "sb")
    EvalMetrics.rankBiasedOverlap(rbo, "g", "id", col("sa"),
        col("sb"), depth = 10)
      .collect().foreach { r =>
        assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L, r) }
    // linkPrediction jaccard in (0, 1e6]; emitted pairs non-adjacent
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong,
      rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
      .toDF("a", "b")
    val eSet = edges.collect().map(r => (math.min(r.getLong(0),
      r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    GraphRank.linkPrediction(edges, "a", "b").collect().foreach { r =>
      val j = r.getLong(5)
      assert(j > 0L && j <= 1000000L, r)
      assert(!eSet.contains((r.getLong(0), r.getLong(1))), r)
    }
    // etaSquared in [0, 1e6]
    val eta = (1 to 400).map(_ => (s"g${rnd.nextInt(7)}",
      rnd.nextInt(2000).toLong - 1000L)).toDF("g", "v")
    val e2 = GroupStats.etaSquared(eta, "g", col("v"))
      .collect()(0).getLong(2)
    assert(e2 >= 0L && e2 <= 1000000L)
    // rsiSimple in [0, 1e6]
    val day = 86400L * 1000000000L
    val rsiEv = (1 to 500).map(_ => ("t",
      (rnd.nextInt(40) + 1).toLong * day)).toDF("t", "ts")
    TechnicalIndicators.rsiSimple(rsiEv, Seq("t"),
        graft.functions.TimeFns.floorDiv(col("ts"), day), lit(1L),
        window = 5)
      .collect().foreach { r =>
        assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L, r) }
  }

  test("HilbertIndex.xy2d: bits=4 is a bijection onto 0..255 and " +
    "every consecutive index is grid-adjacent") {
    import graft.expressions.HilbertIndex
    val pts = for { x <- 0 until 16; y <- 0 until 16 }
      yield ((x, y), HilbertIndex.xy2d(4, x.toLong, y.toLong))
    val byD = pts.map { case (xy, d) => d -> xy }.toMap
    assert(byD.keySet == (0L until 256L).toSet)
    assert((0L until 255L).forall { i =>
      val (x1, y1) = byD(i); val (x2, y2) = byD(i + 1)
      (x1 - x2).abs + (y1 - y2).abs == 1
    })
  }

  test("symmetricDeletePairs: deletion and substitution pairs found, " +
    "transpositions (distance 2) killed by the verify") {
    val docs = Seq("hello helo hxllo abcd abdc hello").toDF("text")
    val got = Dedup.symmetricDeletePairs(docs, "text", minLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // abcd/abdc share deletion variants abc/abd but are distance 2
    assert(got.keySet == Set(("hello", "helo"), ("hello", "hxllo")))
    assert(got(("hello", "helo")) == (2L, 1L))
    assert(got(("hello", "hxllo")) == (2L, 1L))
  }

  test("etaSquared: full separation reads 1e6, identical groups 0, " +
    "constant column 0 by the zero-denominator rule") {
    val full = Seq(("a", 1L), ("a", 1L), ("b", 3L), ("b", 3L))
      .toDF("g", "v")
    assert(GroupStats.etaSquared(full, "g", col("v"))
      .collect()(0).getLong(2) == 1000000L)
    val same = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    assert(GroupStats.etaSquared(same, "g", col("v"))
      .collect()(0).getLong(2) == 0L)
    val const = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    assert(GroupStats.etaSquared(const, "g", col("v"))
      .collect()(0).getLong(2) == 0L)
  }

  test("newVsReturning: first-day actives are new, later days " +
    "split exactly") {
    val day = 86400L * 1000000000L
    val ev = Seq((10L, 1L), (10L, 2L), (20L, 2L))
      .map { case (u, d) => (u, d * day) }.toDF("u", "ts")
    val got = EventAnalytics.newVsReturning(ev, "u", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (1L, 1L, 0L, 0L))
    assert(got(2L) == (2L, 1L, 1L, 500000L))
  }

  test("windowedHllDistinct: streaming registers equal the batch " +
    "sketch over the same rows (lossless state-store merge)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Timestamp, String, String)]
    val df = input.toDF().toDF("event_ts", "t", "uid")
    val agg = Streams.windowedHllDistinct(df, "event_ts", "1 day",
      "1 hour", Seq("t"), "uid")
    val q = agg.writeStream.format("memory")
      .queryName("win_hll").outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 01:00:00"), "g", "u1"),
        (Timestamp.valueOf("2024-01-01 02:00:00"), "g", "u2"))
      q.processAllAvailable()
      input.addData(
        (Timestamp.valueOf("2024-01-01 03:00:00"), "g", "u3"),
        (Timestamp.valueOf("2024-01-01 04:00:00"), "g", "u1"))
      q.processAllAvailable()
      val streamed = spark.table("win_hll")
        .select(graft.expressions.HllSketch.hll_summary(col("regs"))
          .as("h"))
        .select(col("h.v_zero"), col("h.s40"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val batch = Seq("u1", "u2", "u3", "u1").toDF("uid")
        .agg(graft.expressions.HllSketch.hll_registers(col("uid"))
          .as("regs"))
        .select(graft.expressions.HllSketch.hll_summary(col("regs"))
          .as("h"))
        .select(col("h.v_zero"), col("h.s40"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.length == 1 && streamed(0) == batch(0))
    } finally q.stop()
  }

  test("streamingPatternDetect: latest strictly-earlier A within " +
    "the window anchors each B; state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Streams.TypedEvent]
    val hits = Streams.streamingPatternDetect(input.toDS(),
      aType = "view", bType = "purchase", windowNanos = 100L)
    val q = hits.toDF().writeStream.format("memory")
      .queryName("stream_pattern").outputMode("append").start()
    try {
      // batch 1: A@10(id1), A@20(id2), B@25(id3) -> anchor id2;
      // B@200(id4) -> gap 180 > 100, no hit
      input.addData(
        Streams.TypedEvent("u", 10L, 1L, "view"),
        Streams.TypedEvent("u", 20L, 2L, "view"),
        Streams.TypedEvent("u", 25L, 3L, "purchase"),
        Streams.TypedEvent("u", 200L, 4L, "purchase"))
      q.processAllAvailable()
      // batch 2: the batch-1 A@20 is stale; A@210(id5) then B@215
      // (id6) anchors on it; the equal-ts A@300(id7) must NOT shadow
      // the older in-window A@210 — B@300(id8) falls back to it
      // (gap 90), exactly the batch oracle's a.ts < b.ts pick
      input.addData(
        Streams.TypedEvent("u", 210L, 5L, "view"),
        Streams.TypedEvent("u", 215L, 6L, "purchase"),
        Streams.TypedEvent("u", 300L, 7L, "view"),
        Streams.TypedEvent("u", 300L, 8L, "purchase"))
      q.processAllAvailable()
      // batch 3, key v: equal-ts A whose strictly-earlier fallback is
      // OUT of window -> no hit (fallback honors the window bound)
      input.addData(
        Streams.TypedEvent("v", 10L, 9L, "view"),
        Streams.TypedEvent("v", 400L, 10L, "view"),
        Streams.TypedEvent("v", 400L, 11L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("stream_pattern")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == Set((2L, 3L, 5L), (5L, 6L, 5L), (5L, 8L, 90L)))
    } finally q.stop()
  }

  test("versioned state envelope: a v1 (2-field) PatternState payload " +
    "restores through the v2 decoder; unknown versions fail loudly " +
    "(r17 verdict #6)") {
    import graft.streaming.Streams
    import Streams.{PatternState, PatternStateCodec, StateEnvelope}
    // a checkpoint written by the r15 2-field encoder: exactly
    // (aTs, aId) as two big-endian longs under version tag 1
    val v1 = java.nio.ByteBuffer.allocate(16).putLong(42L).putLong(7L)
    val restored = PatternStateCodec.unwrap(StateEnvelope(1, v1.array()))
    assert(restored == PatternState(42L, 7L, 0L, 0L, hasPrev = false),
      "v1 restores with no fallback slot — what a v1 checkpoint knew")
    // current-version round trip is exact
    val s2 = PatternState(100L, 9L, 80L, 8L, hasPrev = true)
    assert(PatternStateCodec.unwrap(PatternStateCodec.wrap(s2)) == s2)
    assert(PatternStateCodec.wrap(s2).version == 2)
    // a payload from the FUTURE must error with the version named,
    // never misread bytes
    val e = intercept[IllegalStateException] {
      PatternStateCodec.unwrap(StateEnvelope(3,
        PatternStateCodec.encode(s2)))
    }
    assert(e.getMessage.contains("version 3"))
  }
}
