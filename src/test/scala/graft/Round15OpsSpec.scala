package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-15 operator semantics: chi-squared independence, BFS hops,
  * ordered-pair support, association rules, KS drift, isotonic
  * calibration, degree assortativity — each against a hand-computed
  * fixture. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquare: balanced 2x2 association is exact (chi2 = 20, " +
    "V^2 = 0.25)") {
    // X:(p 30, q 10), Y:(p 10, q 30): N=80, all marginals 40, E=20.
    // chi2 = 4 * (10^2/20) = 20; per-cell ladder: diff=800, ec=1600,
    // q1 = 800000//1600 = 500, term = (500*800*1000)//80 = 5e6.
    val rows = Seq.fill(30)(("X", "p")) ++ Seq.fill(10)(("X", "q")) ++
      Seq.fill(10)(("Y", "p")) ++ Seq.fill(30)(("Y", "q"))
    val out = GroupStats.chiSquare(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(out.getLong(0) == 80L && out.getLong(1) == 2L &&
      out.getLong(2) == 2L && out.getLong(3) == 1L)
    assert(out.getLong(4) == 20000000L)
    assert(out.getLong(5) == 250000L)
  }

  test("chiSquare: EMPTY cells carry their expected mass " +
    "(the r x c grid, not just observed cells)") {
    // X:(p 4), Y:(p 1, q 5) — cell (X, q) is absent but E = 2.
    // Hand ladder: all four |diff| = 20; X-row ec=20 -> term 2e6 each,
    // Y-row ec=30 -> q1 = 20000//30 = 666, term = 1332000 each.
    val rows = Seq.fill(4)(("X", "p")) ++ Seq(("Y", "p")) ++
      Seq.fill(5)(("Y", "q"))
    val out = GroupStats.chiSquare(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(out.getLong(4) == 6664000L) // exact chi2 = 6.6667
    assert(out.getLong(5) == 666400L)
  }

  test("bfsHops: path graph distances, ball cut at maxHops, " +
    "unreached absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = GraphRank.bfsHops(edges, "s", "d",
        Seq(1L).toDF("node"), "node", maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bfsHops: multi-source takes the MIN over seeds; isolated " +
    "seeds report 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = GraphRank.bfsHops(edges, "s", "d",
        Seq(1L, 5L, 99L).toDF("node"), "node", maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(3L) == 2L && got(2L) == 1L && got(4L) == 1L &&
      got(99L) == 0L)
  }

  test("bfsHops: frontier relaxation (r20) exact on cycles and " +
    "converging paths — first discovery is final") {
    // UNDIRECTED reading: 1-2-3-4 path, a 1-5-6-4 detour, and the
    // 4-1 edge closing a cycle. Node 4 is reachable at hops 3 (via
    // 2,3), hops 3 (via 5,6) AND hops 1 (direct) — the min must win
    // even though only round-(h-1) discoveries expand, and the cycle
    // must not re-enqueue settled node 1 or loop forever.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 6L),
      (6L, 4L), (4L, 1L)).toDF("s", "d")
    val got = GraphRank.bfsHops(edges, "s", "d",
        Seq(1L).toDF("node"), "node", maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 1L), (5L, 1L), (4L, 1L),
      (3L, 2L), (6L, 2L)))
  }

  test("orderedPairSupport: min(A) < max(B) is the existential " +
    "'some A strictly before some B'") {
    // u1: A@1 B@2 -> (A,B). u2: B@1 A@2 -> (B,A).
    // u3: A@1 A@5 B@3 -> BOTH (A@1<B@3 and B@3<A@5).
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (2L, 1L, "B"),
      (2L, 2L, "A"), (3L, 1L, "A"), (3L, 5L, "A"), (3L, 3L, "B"))
      .toDF("u", "ts", "t")
    val got = EventAnalytics.orderedPairSupport(ev, "u", "ts", "t")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // U=3, n_A = n_B = 3; lift = n_ab*3/9
    assert(got(("A", "B")) == (2L, 3L, 3L, 666667L))
    assert(got(("B", "A")) == (2L, 3L, 3L, 666667L))
  }

  test("associationRules: support shared, confidence directional, " +
    "lift symmetric") {
    // b1{x,y} b2{x,y} b3{x} b4{y,z}: pair (x,y) n_co=2, n_x=3, n_y=3,
    // B=4 baskets.
    val ev = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (4L, "y"), (4L, "z")).toDF("b", "it")
    val got = CoOccurrence.associationRules(ev, "b", "it",
        minSupport = 2L, maxBasketSize = 64)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got.size == 2)
    // support 2/4, confidence 2/3, lift 2*4/(3*3)
    assert(got(("x", "y")) == (2L, 500000L, 666667L, 888889L))
    assert(got(("y", "x")) == (2L, 500000L, 666667L, 888889L))
  }

  test("ksGroupVsRest: disjoint supports give D = 1 at the group's " +
    "top value; at_units is the smallest argmax") {
    val docs = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("g", "v")
    val got = Drift.ksGroupVsRest(docs, "g", col("v"))
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // max gap at v=2 on both sides: |cumA*nB - cumB*nA| = 4 of 4
    assert(got("A") == (2L, 2L, 1000000L, 2L))
    assert(got("B") == (2L, 2L, 1000000L, 2L))
  }

  test("isotonicCalibration: a decreasing pair pools to the shared " +
    "mean (PAV via minimax)") {
    // bin0: 2/2 pos, bin1: 0/2 — violator; PAV pools both to 1/2.
    val df = Seq((100L, true), (150L, true), (1500L, false),
      (1600L, false)).toDF("s", "y")
    val got = EvalMetrics.isotonicCalibration(df, "s", "y", bins = 10)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == (1000000L, 500000L))
    assert(got(1L) == (0L, 500000L))
  }

  test("isotonicCalibration: an already-monotone curve is fixed " +
    "unchanged") {
    val df = Seq((100L, false), (150L, false), (9500L, true),
      (9600L, true)).toDF("s", "y")
    val got = EvalMetrics.isotonicCalibration(df, "s", "y", bins = 10)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == (0L, 0L))
    assert(got(9L) == (1000000L, 1000000L))
  }

  test("degreeAssortativity: a star is perfectly disassortative " +
    "(r = -1)") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = GraphRank.degreeAssortativity(e, "a", "b").collect()(0)
    assert(out.getLong(0) == 6L) // double cover of 3 edges
    assert(out.getDouble(1) == -36.0)
    assert(out.getDouble(2) == -1.0)
  }

  test("activityStreaks: islands split on the missing day") {
    val day = 86400L * 1000000000L
    val ev = Seq(1L, 2L, 3L, 7L, 8L, 8L) // dup day must not double
      .map(d => (5L, d * day + 42L)).toDF("u", "ts")
    val out = EventAnalytics.activityStreaks(ev, "u", "ts")
      .collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((5L, 2L, 3L)))
  }

  test("ols2: recovers an exact plane y = 2 + 3*x1 - 2*x2") {
    val pts = Seq((0L, 0L, 2L), (1L, 0L, 5L), (0L, 1L, 0L),
      (1L, 1L, 3L), (2L, 1L, 6L)).toDF("x1", "x2", "y")
    val out = GroupStats.ols2(pts, Seq.empty, col("x1"), col("x2"),
      col("y")).collect()(0)
    assert(out.getLong(0) == 5L)
    assert(out.getLong(1) == 3000000L)  // beta1
    assert(out.getLong(2) == -2000000L) // beta2
    assert(out.getLong(3) == 2000000L)  // beta0
  }

  test("streamingEwma: trailing ring reproduces the batch series; " +
    "sentinel closes the final day; straddled day accumulates") {
    import graft.streaming.Streams
    val root = java.nio.file.Files
      .createTempDirectory("graft_ewma_stream")
    val src = s"$root/feed"
    new java.io.File(src).mkdirs()
    // counts by day: d0=2, d1=1, d3=4 (observed-day gap at d2); day 3
    // STRADDLES batches 1/2; sentinel day 4 ships last. Powers (1/2)^k
    // to age 2: [1000000, 500000, 250000] — d3's window drops d0.
    def rows(day: Long, n: Int, b: Int) = Seq.fill(n)(("a", day, b))
    Streams.stageBatchFiles(
      (rows(0L, 2, 0) ++ rows(1L, 1, 0) ++ rows(3L, 2, 1) ++
        rows(3L, 2, 2) ++ rows(4L, 1, 2))
        .toDF("group", "day", "b"), "b", src)
    val stream = spark.readStream
      .schema("group STRING, day LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .as[Streams.DayEvent]
    val out = s"$root/out"
    val q = Streams
      .streamingEwma(stream, Seq(1000000L, 500000L, 250000L))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // d0: 2*1e6; d1: 1*1e6 + 2*5e5; d3: 4*1e6 + 1*25e4 (d1 at age 2,
    // d0 evicted past the horizon); sentinel d4 never emits
    assert(got == Map(0L -> (2L, 2000000L), 1L -> (1L, 2000000L),
      3L -> (4L, 4250000L)))
  }

  test("streamingEwma: the open day and trailing ring survive a " +
    "checkpoint RESTART across separate query runs") {
    import graft.streaming.Streams
    val root = java.nio.file.Files
      .createTempDirectory("graft_ewma_restart")
    val feed = s"$root/feed"
    val out = s"$root/out"
    new java.io.File(feed).mkdirs()
    def run(): Unit = {
      val stream = spark.readStream
        .schema("group STRING, day LONG")
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .as[Streams.DayEvent]
      val q = Streams.streamingEwma(stream, Seq(1000000L, 500000L))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq(("a", 0L), ("a", 0L), ("a", 1L)).toDF("group", "day")
      .repartition(1).write.mode("append").parquet(feed)
    run() // emits day 0; day 1 rides OPEN in the checkpointed state
    Seq(("a", 2L), ("a", 3L)).toDF("group", "day")
      .repartition(1).write.mode("append").parquet(feed)
    run() // day 1 closes against state written by the FIRST run
    val got = spark.read.parquet(out)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // powers (1, 1/2), horizon 1 day: d0 = 2e6; d1 = 1e6 + 2*5e5;
    // d2 = 1e6 + 1*5e5 (d0 evicted past the horizon); d3 still open
    assert(got == Map(0L -> (2L, 2000000L), 1L -> (1L, 2000000L),
      2L -> (1L, 1500000L)))
  }

  test("quantizeInt8Card: endpoints land on the grid exactly, the " +
    "midpoint carries half-step error") {
    val emb = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val out = Spectral.quantizeInt8Card(emb, "vec_id", "embedding")
      .collect()(0)
    // lo=0, hi=1e6; u=5e5 -> q=128, err = |255*5e5 - 128*1e6| = 5e5
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4), out.getLong(5)) ==
      ((1L, 3L, 0L, 1000000L, 500000L, 500000L)))
  }

  test("oovRate: (count DESC, word ASC) vocabulary order; token and " +
    "type shares per source") {
    val docs = Seq(("A", "the cat"), ("B", "the dog dog"))
      .toDF("source", "text")
    val got = VocabBuild.oovRate(docs, "text", "source", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // global: the:2 dog:2 cat:1 -> vocab {dog, the}
    assert(got("A") == (2L, 1L, 2L, 1L, 500000L))
    assert(got("B") == (3L, 0L, 2L, 0L, 0L))
  }

  test("contrastCard: BT.709 integer luma stats over a real P6 " +
    "decode; corrupt payload yields nulls") {
    val hdr = "P6\n1 2\n255\n".getBytes("UTF-8")
    val px = Array[Byte](-1, -1, -1, 0, 0, 0) // white, black
    val df = Seq((1L, hdr ++ px), (2L, "nonsense".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = graft.operators.Multimodal
      .contrastCard(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    val ok = got(1L)
    assert((ok.getLong(1), ok.getLong(2), ok.getLong(4),
      ok.getLong(5)) == ((2L, 2550000L, 0L, 2550000L)))
    assert(ok.getLong(3) == 2550000L * 2550000L)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(5))
  }

  test("strictFunnel: strictly-after ordering, horizon from the " +
    "stage-1 anchor, greedy earliest chain") {
    val h = 100L
    // u1 completes; u2's purchase precedes its view; u4's view ties
    // the signup ts (not strictly after); u5's view is past the
    // horizon; u3 never signs up
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 1L, "view"), (1L, 2L, "purchase"),
      (2L, 0L, "signup"), (2L, 1L, "purchase"), (2L, 2L, "view"),
      (3L, 0L, "view"),
      (4L, 0L, "signup"), (4L, 0L, "view"),
      (5L, 0L, "signup"), (5L, 101L, "view"))
      .toDF("u", "ts", "t")
    val got = EventAnalytics.strictFunnel(ev, "u", "ts", "t",
        Seq("signup", "view", "purchase"), horizonNanos = h)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("signup", 4L, 1000000L)))
    assert(got(2L) == (("view", 2L, 500000L)))
    assert(got(3L) == (("purchase", 1L, 250000L)))
  }

  test("coverageCurve: cumulative head shares at each cutoff") {
    val docs = Seq(Tuple1("a a a b b c")).toDF("text")
    val got = VocabBuild.coverageCurve(docs, "text", Seq(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 6L, 500000L)))
    assert(got(2L) == ((5L, 6L, 833333L)))
    assert(got(3L) == ((6L, 6L, 1000000L)))
  }

  test("rfmScores: quintiles over the unique (metric, user) order; " +
    "recency measured against the corpus horizon") {
    val day = 86400L * 1000000000L
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(_ => (u.toLong, (11 - u) * day, u.toDouble))
    }.toDF("u", "ts", "v")
    val got = EventAnalytics.rfmScores(ev, "u", "ts", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7)))
      .toMap
    // u1: 1 event on the horizon day -> recency 0, freq 1, m 100,
    // all quintiles 1; u5: 5 events 4 days back -> all quintiles 5
    assert(got(1L) == (0L, 1L, 100L, 111L))
    assert(got(3L) == (2L, 3L, 900L, 333L))
    assert(got(5L) == (4L, 5L, 2500L, 555L))
  }

  test("topPaths: first-k prefix in (ts, tie) order; shorter " +
    "journeys keep their full path") {
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c"),
      (1L, 4L, 40L, "d"),
      (2L, 1L, 10L, "a"), (2L, 2L, 20L, "b"),
      (3L, 5L, 50L, "x"), (3L, 5L, 49L, "y")) // tie: id 49 first
      .toDF("u", "ts", "id", "t")
    val got = EventAnalytics.topPaths(ev, "u", "ts", "id", "t", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a>b>c" -> 1L, "a>b" -> 1L, "y>x" -> 1L))
  }

  test("linearAttribution: equal truncating split over in-window " +
    "strictly-before touches; organic conversions report 0") {
    val h = 1000L
    val ev = Seq(
      // conv 100: 3 touches in window -> 333333 each
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "view"), (1L, 500L, 100L, "purchase"),
      // conv 101: one touch AT the conv ts (not strictly before) and
      // one outside the window -> organic
      (2L, 700L, 4L, "view"), (2L, 2000L, 5L, "view"),
      (2L, 2000L, 101L, "purchase"))
      .toDF("u", "ts", "id", "t")
    val got = EventAnalytics.linearAttribution(ev, "u", "ts", "id",
        "t", "view", "purchase", windowNanos = h)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got(100L) == (3L, 333333L))
    assert(got(101L) == (0L, 0L))
  }

  test("vectorQa: ragged dims, null pollution, and zero vectors all " +
    "surface on the card") {
    val emb = Seq(
      (1L, Seq[java.lang.Float](1.0f, 0.0f)),
      (2L, Seq[java.lang.Float](0.0f, 0.0f)),          // zero vector
      (3L, Seq[java.lang.Float](0.5f, null, 0.5f)),    // null + ragged
      (4L, Seq[java.lang.Float](2.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = Spectral.vectorQa(emb, "vec_id", "embedding").collect()(0)
    assert(r.getLong(0) == 4L)                      // n_vecs
    assert((r.getLong(1), r.getLong(2)) == ((2L, 3L))) // dims range
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)   // null / zero
    assert(r.getLong(5) == 0L)                      // min sqnorm (zero vec)
    assert(r.getLong(6) == 5000000000000L)          // 4e12 + 1e12
    assert(r.getLong(7) == 6500000000000L)          // 1e12 + 0 + 0.5e12 + 5e12
  }

  test("giniStump: the perfect separator scores the exact variance " +
    "reduction; equal scores break to the smallest threshold") {
    val perfect = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "y")
    val r = EvalMetrics.giniStump(perfect, "y", col("v")).collect()(0)
    // split at v<=2: delta-var = 0.25 -> 250000 via the exact ladder
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((4L, 2L, 2L, 250000L, 2L, 2L)))
    val tied = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("v", "y")
    val t = EvalMetrics.giniStump(tied, "y", col("v")).collect()(0)
    // thresholds 1 and 3 tie at 83250; the smaller threshold wins
    assert(t.getLong(2) == 1L && t.getLong(3) == 83250L)
  }

  test("weekOverWeek: windows anchor on the CORPUS horizon; absent " +
    "prior week reads 0 by the zero-denominator rule") {
    val day = 86400L * 1000000000L
    val ev = Seq(("A", 20L), ("A", 10L), ("B", 20L), ("B", 19L),
      ("C", 5L)).map { case (t, d) => (t, d * day) }.toDF("t", "ts")
    val got = EventAnalytics.weekOverWeek(ev, "t", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("A") == (1L, 1L, 1000000L))
    assert(got("B") == (2L, 0L, 0L))
    assert(got("C") == (0L, 0L, 0L))
  }

  test("thresholdCurve: cumulative pair/doc counts per cutoff, " +
    "zero-filled tail") {
    import graft.operators.Dedup
    // pair scores: (1,2)=9000, (2,3)=5000, (4,5)=3000
    val pairs = Seq((1L, 2L, 9000L), (2L, 3L, 5000L), (4L, 5L, 3000L))
      .toDF("a", "b", "s")
    val got = Dedup.thresholdCurve(pairs, "a", "b", col("s"),
        Seq(2500L, 5000L, 7500L, 9500L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got(2500L) == (3L, 5L))
    assert(got(5000L) == (2L, 3L)) // pairs (1,2),(2,3) -> docs {1,2,3}
    assert(got(7500L) == (1L, 2L))
    assert(got(9500L) == (0L, 0L))
  }

  test("personalizedPageRank: teleport mass lands only on seeds; " +
    "hand-computed two-iteration chain") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = GraphRank.personalizedPageRank(e, "s", "d",
        Seq(1L).toDF("node"), "node", iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // r1: 1 -> 150000 (base only), 2 -> 850000, 3 -> 0
    // r2: 1 -> 150000, 2 -> 85*150000//100, 3 -> 85*850000//100
    assert(got == Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L))
  }

  test("temporalCooccurrence: window bound, unordered type emit, " +
    "each event pair counted once") {
    val ev = Seq(
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "b"),   // within window
      (1L, 500L, 3L, "b"),                      // outside vs id 1
      (1L, 40L, 4L, "a"),                       // same type as id 1
      (2L, 0L, 5L, "b"), (2L, 30L, 6L, "a"))    // second user
      .toDF("u", "ts", "id", "t")
    val got = EventAnalytics.temporalCooccurrence(ev, "u", "ts", "id",
        "t", windowNanos = 100L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // pairs: u1 (1,2) a-b, u1 (2,4) b-a, u2 (5,6) b-a -> 3 pairs,
    // 2 users
    assert(got == Map(("a", "b") -> (3L, 2L)))
  }

  test("clippingCard: rails count on BOTH signs, runs beat single " +
    "peaks, corrupt payloads emit nothing") {
    def le32(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
      ((v >> 24) & 255).toByte)
    def le16(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte)
    val samples = Seq(0, 32767, 32767, 32767, 100, -32768, 0, 50)
    val data = samples.flatMap(le16(_)).toArray
    val hdr = "RIFF".getBytes("UTF-8") ++ le32(36 + data.length) ++
      "WAVE".getBytes("UTF-8") ++ "fmt ".getBytes("UTF-8") ++
      le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ "data".getBytes("UTF-8") ++
      le32(data.length)
    val df = Seq((1L, hdr ++ data), (2L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = graft.operators.Multimodal
      .clippingCard(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(1L -> (8L, 4L, 3L, 500000L)))
  }

  test("neighborLabelPurity: best-neighbor argmax with smallest-id " +
    "ties; nodes without pairs are absent") {
    // pairs: (1,2,9000) (1,3,9000) tie -> node1's nbr = 2;
    // (4,5,5000); node 6 isolated
    val pairs = Seq((1L, 2L, 9000L), (1L, 3L, 9000L), (4L, 5L, 5000L))
      .toDF("a", "b", "s")
    val labels = Seq((1L, 10), (2L, 10), (3L, 20), (4L, 10), (5L, 20),
      (6L, 10)).toDF("vec_id", "label")
    val got = EvalMetrics.neighborLabelPurity(pairs, "a", "b",
        col("s"), labels, "vec_id", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // label 10: nodes 1 (nbr 2, agree), 2 (nbr 1, agree), 4 (nbr 5,
    // disagree) -> 3 nodes 2 agree; label 20: 3 (nbr 1, disagree),
    // 5 (nbr 4, disagree)
    assert(got(10L) == (3L, 2L, 666667L))
    assert(got(20L) == (2L, 0L, 0L))
  }

  test("kCore: pendant chain peels over successive rounds, the " +
    "triangle core survives") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphRank.kCore(e, "a", "b", k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round fewer still counts node 4's stale edge into node 3
    val shallow = GraphRank.kCore(e, "a", "b", k = 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(shallow(3L) == 3L && !shallow.contains(5L))
  }
}
