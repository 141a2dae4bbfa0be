package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-16 operator semantics: Markov next-event backtest, discrete
  * churn hazard, Theil–Sen robust trend, Wald–Wolfowitz runs test —
  * each against a hand-computed fixture. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400L * 1000000000L

  test("markovBacktest: midpoint split by target day, train argmax " +
    "with smallest-type ties, cold-start predicts NULL") {
    // u1 transitions (target day): A->B@0, B->A@1, A->B@1 (train,
    // split day = (0+3)//2+1 = 2), B->A@3, A->C@3 (test).
    // u2: Z->B@3 (test) with Z unseen in training.
    val ev = Seq(
      ("u1", 0L * DAY, 1L, "A"), ("u1", 0L * DAY + 1L, 2L, "B"),
      ("u1", 1L * DAY, 3L, "A"), ("u1", 1L * DAY + 1L, 4L, "B"),
      ("u1", 3L * DAY, 5L, "A"), ("u1", 3L * DAY + 1L, 6L, "C"),
      ("u2", 0L * DAY, 7L, "Z"), ("u2", 3L * DAY, 8L, "B"))
      .toDF("u", "ts", "eid", "t")
    val got = EventAnalytics.markovBacktest(ev, "u", "ts", "eid", "t")
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
    assert(got == Map(
      "A" -> ((Some("B"), 1L, 0L, 0L)),       // predicted B, saw C
      "B" -> ((Some("A"), 1L, 1L, 1000000L)), // predicted A, saw A
      "Z" -> ((None, 1L, 0L, 0L))))           // cold start
  }

  test("churnHazard: at-risk exposure per offset, corpus-edge users " +
    "censored (never churned)") {
    // u1 day0 only (life 0, churn@0); u2 days0-2 (churn@2);
    // u3 days1-4 (ends at horizon 4 -> censored); u4 day4 only
    // (censored). at_risk: k0:4, k1:2, k2:2, k3:1.
    val ev = Seq(
      ("u1", 0L), ("u2", 0L), ("u2", 1L), ("u2", 2L),
      ("u3", 1L), ("u3", 4L), ("u4", 4L))
      .map { case (u, d) => (u, d * DAY) }.toDF("u", "ts")
    val got = EventAnalytics.churnHazard(ev, "u", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      0L -> ((4L, 1L, 250000L)),
      1L -> ((2L, 0L, 0L)),
      2L -> ((2L, 1L, 500000L)),
      3L -> ((1L, 0L, 0L))))
  }

  test("theilSen: lower-median pairwise slope; negative quotients " +
    "truncate toward zero on both engines") {
    // T1 daily counts day0:1 day1:3 day2:2 -> slopes e6
    // {2000000, 500000, -1000000}, median 500000 of 3 pairs.
    // T2 day0:3 day19:1 -> -2e6 div 19 = -105263 (truncation, the
    // measured DuckDB integer-// convention).
    val rows =
      Seq.fill(1)(("T1", 0L)) ++ Seq.fill(3)(("T1", 1L)) ++
        Seq.fill(2)(("T1", 2L)) ++
        Seq.fill(3)(("T2", 0L)) ++ Seq.fill(1)(("T2", 19L))
    val ev = rows.map { case (t, d) => (t, d * DAY) }.toDF("t", "ts")
    val got = EventAnalytics.theilSen(ev, "t", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("T1" -> ((3L, 500000L)),
      "T2" -> ((1L, -105263L))))
  }

  test("runsTest: median-tie days discarded, runs counted in day " +
    "order, exact expected-run rational") {
    // Counts by day: [1,5,1,5,5,1,9]; lower median 5; signs by day
    // (ties dropped): -,-,-,+ -> runs 2, n_above 1, n_below 3,
    // expected = 1e6 + 2*1*3/4 e6 = 2500000.
    val counts = Seq(1, 5, 1, 5, 5, 1, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("A", d.toLong * DAY)) }
    val ev = rows.toDF("t", "ts")
    val got = EventAnalytics.runsTest(ev, "t", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", 1L, 3L, 2L, 2500000L)))
  }

  test("concentration: equal shares read gini 0 / hhi 1e6÷n; a " +
    "monopoly reads gini (n−1)/n / hhi 1e6") {
    val df = Seq(("s", 1L, 5L), ("s", 2L, 5L), ("s", 3L, 5L),
      ("s", 4L, 5L),
      ("t", 1L, 0L), ("t", 2L, 0L), ("t", 3L, 0L), ("t", 4L, 10L))
      .toDF("g", "id", "x")
    val got = GroupStats.concentration(df, "g", "id", col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("s") == ((4L, 20L, 0L, 250000L)))
    assert(got("t") == ((4L, 10L, 750000L, 1000000L)))
  }

  test("readability: Coleman–Liau e2 with truncating division and " +
    "the sentence floor") {
    // "Abc de. Fg!": L=7, W=3, S=2 ->
    // (7*588 - 2*2960) div 3 - 1580 = -601 - 1580 = -2181
    // "no terminators here": L=17, W=3, S=floor(0)=1 ->
    // (9996 - 2960) div 3 - 1580 = 2345 - 1580 = 765
    val df = Seq((1L, "Abc de. Fg!"), (2L, "no terminators here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((7L, 3L, 2L, -2181L)))
    assert(got(2L) == ((17L, 3L, 1L, 765L)))
  }

  test("acfDaily: perfect alternation reads -1e6 at lag 1 and +1e6 " +
    "at lag 2; a constant series reads 0") {
    // type A counts by day: [2,4,2,4,2,4]; type B constant 3
    val aCounts = Seq(2, 4, 2, 4, 2, 4)
    val rows = aCounts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("A", d.toLong * DAY)) } ++
      (0 until 6).flatMap(d => Seq.fill(3)(("B", d.toLong * DAY)))
    val got = EventAnalytics.acfDaily(rows.toDF("t", "ts"), "t", "ts",
      maxLag = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("A", 1L)) == ((5L, -1000000L)))
    assert(got(("A", 2L)) == ((4L, 1000000L)))
    assert(got(("B", 1L)) == ((5L, 0L)))   // zero variance -> 0
    // lags beyond the overlap horizon emit no row
    assert(!got.contains(("A", 6L)))
  }

  test("basketTriples: C(s,3) expansion over capped baskets, " +
    "min-support filter, e6 support share") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L), (2L, 40L),
      (3L, 10L), (3L, 20L))
      .toDF("b", "i")
    val got = CoOccurrence.basketTriples(df, "b", "i",
      minSupport = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4))))
    assert(got.toSeq == Seq(((10L, 20L, 30L), (2L, 666667L))))
    graft.Caches.unpersistAll()
  }

  test("centroidShift: exact squared-L2 between half centroids in " +
    "e12; single-half labels report NULL") {
    val emb = Seq(
      (2L, Array(1.0f, 0.0f), "X"),  // even -> half A
      (3L, Array(0.0f, 1.0f), "X"),  // odd  -> half B
      (4L, Array(0.5f, 0.5f), "Y"))  // only half A
      .toDF("vec_id", "embedding", "label")
    val got = Prototypes.centroidShift(emb, "vec_id", "embedding",
      "label", pmod(col("vec_id"), lit(2)) === 1)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // |(1,0) - (0,1)|^2 = 2 -> 2e12
    assert(got == Map("X" -> Some(2000000000000L), "Y" -> None))
  }

  test("wasserstein1GroupVsRest: gap × interval integral, exact e2 " +
    "units; identical distributions read 0") {
    // A = {0, 10}, B = {10, 10}: at v=0 the ECDF gap is 1/2 over an
    // interval of 10 -> W1 = 5 -> 500 e2 (symmetric for B).
    val df = Seq(("A", 0L), ("A", 10L), ("B", 10L), ("B", 10L))
      .toDF("g", "v")
    val got = Drift.wasserstein1GroupVsRest(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("A" -> 500L, "B" -> 500L))
    val same = Seq(("A", 1L), ("A", 9L), ("B", 1L), ("B", 9L))
      .toDF("g", "v")
    val got2 = Drift.wasserstein1GroupVsRest(same, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got2 == Map("A" -> 0L, "B" -> 0L))
    graft.Caches.unpersistAll()
  }

  test("twoHopReach: path graph reach, hub-middle cap drops " +
    "two-step coverage only (degrees stay true)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    def rows(cap: Int) = GraphRank.twoHopReach(e, "a", "b", cap)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0) == Map(1L -> ((1L, 2L)), 2L -> ((2L, 3L)),
      3L -> ((2L, 3L)), 4L -> ((1L, 2L))))
    // cap 1: only degree-1 middles (1 and 4) survive, each with a
    // single neighbor -> no two-step pairs at all
    assert(rows(1) == Map(1L -> ((1L, 1L)), 2L -> ((2L, 2L)),
      3L -> ((2L, 2L)), 4L -> ((1L, 1L))))
    graft.Caches.unpersistAll()
  }

  test("interpolateDaily: exact truncated blend between anchors, " +
    "NULL outside a type's observed span") {
    // A: day0 count 2, day3 count 8 -> days 1/2 blend 4e6/6e6.
    // B: only day1 -> day0 and days 2-3 have no anchor pair -> NULL.
    val rows = Seq.fill(2)(("A", 0L)) ++ Seq.fill(8)(("A", 3L)) ++
      Seq.fill(4)(("B", 1L))
    val ev = rows.map { case (t, d) => (t, d * DAY) }.toDF("t", "ts")
    val got = EventAnalytics.interpolateDaily(ev, "t", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(("A", 0L)) == ((true, Some(2000000L))))
    assert(got(("A", 1L)) == ((false, Some(4000000L))))
    assert(got(("A", 2L)) == ((false, Some(6000000L))))
    assert(got(("A", 3L)) == ((true, Some(8000000L))))
    assert(got(("B", 0L)) == ((false, None)))
    assert(got(("B", 1L)) == ((true, Some(4000000L))))
    assert(got(("B", 2L)) == ((false, None)))
    assert(got(("B", 3L)) == ((false, None)))
  }

  test("partitionModularity: exact two-term ladder; isolated-label " +
    "zero row") {
    // Edges 1-2, 2-3, 3-4 (m=3); labels {1,2}->0, {3,4}->1, {5}->2.
    // e_0 = e_1 = 1, d_0 = d_1 = 3 ->
    // q_e12 = 1e12//3 - 9e12//36 = 333333333333 - 250000000000.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val mem = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L))
      .toDF("node", "lab")
    val got = GraphRank.partitionModularity(e, "a", "b", mem, "node",
      "lab").collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      0L -> ((2L, 1L, 3L, 83333333333L)),
      1L -> ((2L, 1L, 3L, 83333333333L)),
      2L -> ((1L, 0L, 0L, 0L))))
  }

  test("diffInDiff: hand-computed cells over hash-parity arms and the " +
    "midpoint split") {
    // Days 0-3 -> split 2. Treat (odd users 1,3): pre 1, post 3.
    // Ctrl (even 2,4): pre 2, post 3. Views pin the horizon + users.
    val rows = Seq(
      ("p", 1L, 0L), ("p", 1L, 2L), ("p", 1L, 2L), ("p", 1L, 2L),
      ("p", 2L, 1L), ("p", 2L, 1L), ("p", 2L, 3L), ("p", 2L, 3L),
      ("p", 4L, 3L),
      ("v", 3L, 0L), ("v", 4L, 0L), ("v", 1L, 3L))
    val ev = rows.map { case (t, u, d) =>
      (if (t == "p") "purchase" else "view", u, d * DAY)
    }.toDF("t", "u", "ts")
    val got = EventAnalytics.diffInDiff(ev, "u", "ts", "t", "purchase")
      .collect().head
    assert((got.getLong(0), got.getLong(1)) == ((2L, 2L)))
    assert((got.getLong(2), got.getLong(3)) == ((500000L, 1500000L)))
    assert((got.getLong(4), got.getLong(5)) == ((1000000L, 1500000L)))
    assert(got.getLong(6) == 500000L)
  }

  test("changepointDaily: argmax of the exact between-segment SS " +
    "gain, day-asc tie rule") {
    // A: days 0,1 count 1; days 2,3 count 5 -> best split after day 1
    // (gain 2e6 + 50e6 - 36e6 = 16e6).
    val rows = Seq(0L -> 1, 1L -> 1, 2L -> 5, 3L -> 5)
      .flatMap { case (d, c) => Seq.fill(c)(("A", d * DAY)) }
    val got = EventAnalytics.changepointDaily(
      rows.toDF("t", "ts"), "t", "ts").collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      (("A", 1L, 2L, 2L, 16000000L)))
  }

  test("stagedOrc: roundtrip fidelity and build-once marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-spec")
      .toString
    var builds = 0
    def build = {
      builds += 1
      Seq((1L, "x", 100L), (2L, "y", -5L)).toDF("k", "s", "v")
    }
    val first = graft.Tables.stagedOrc(spark, dir)(build)
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(first == Seq((1L, "x", 100L), (2L, "y", -5L)))
    val second = graft.Tables.stagedOrc(spark, dir)(build)
      .count()
    assert(second == 2L && builds == 1)
  }

  test("oversampleBalanced: exact target counts, remainder on the " +
    "smallest ids") {
    // Label 0: ids 1..5 (majority, n=5). Label 1: ids 10,11 (n=2,
    // rep=2, extra=1 -> id 10 gets 3 copies, id 11 gets 2).
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map((_, 0L)) ++
      Seq(10L, 11L).map((_, 1L))).toDF("vec_id", "label")
    val m = Sampling.oversampleBalanced(df, "vec_id", "label")
    val perId = m.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId(10L) == 3L && perId(11L) == 2L)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(perId(_) == 1L))
    val perLabel = m.groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perLabel == Map(0L -> 5L, 1L -> 5L))
  }

  test("generalizationLadder: signed floor buckets, per-width class " +
    "stats and k verdict") {
    // Width 10: values -15,-5 land in buckets -2,-1 (floor, NOT
    // truncation); width 100: all four rows of cat A join one bucket.
    val df = Seq(("A", -15L), ("A", -5L), ("A", 5L), ("A", 15L),
      ("B", 5L)).toDF("cat", "v")
    val got = PrivacyAudit.generalizationLadder(df, "cat", col("v"),
      widths = Seq(10L, 100L), k = 2L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // w=10: A has buckets -2,-1,0,1 (size 1 each), B bucket 0 (1)
    assert(got(10L) == ((5L, 1L, 5L, false)))
    // w=100: A bucket -1 {-15,-5} size 2, A bucket 0 {5,15} size 2,
    // B bucket 0 size 1
    assert(got(100L) == ((3L, 1L, 1L, false)))
  }

  test("textRank: two rounds of the string-keyed rank ladder on a " +
    "3-word graph") {
    // "a b a b" + "a c": edges a-b, a-c. Round 1: r(a)=1850000,
    // r(b)=r(c)=575000. Round 2: r(a)=1127500, r(b)=r(c)=936250.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc", "text")
    val got = TextAnalysis.textRank(docs, "doc", "text",
      iterations = 2, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1127500L), ("b", 936250L),
      ("c", 936250L)))
    graft.Caches.unpersistAll()
  }

  test("brierDecomposition: hand-computed Murphy components over two " +
    "occupied bins, p = 1e6 folds into the top bin") {
    val df = Seq((50000L, false), (50000L, true), (950000L, true),
      (1000000L, true)).toDF("p", "y")
    val got = EvalMetrics.brierDecomposition(df, "p", "y").collect()
      .head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      ((4L, 226875L, 101562L, 62500L, 187500L)))
  }

  test("localClustering: triangle + pendant, half-up e6, hub cap " +
    "drops over-cap rows") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphRank.localClustering(e, "a", "b").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)), 3L -> ((3L, 1L, 333333L)),
      4L -> ((1L, 0L, 0L))))
    graft.Caches.unpersistAll()
    val capped = GraphRank.localClustering(e, "a", "b",
      maxCenterDegree = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(capped == Map(1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)), 4L -> ((1L, 0L, 0L))))
    graft.Caches.unpersistAll()
  }

  test("stagedOrc: type fidelity across timestamp, decimal, array " +
    "and null columns") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-orc-types").toString
    val src = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        BigDecimal("12345.67"), Seq(1.5f, -2.25f), Option("x")),
      (2L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0"),
        BigDecimal("-0.01"), Seq.empty[Float], Option.empty[String]))
      .toDF("k", "ts", "dec", "arr", "s")
      .select(col("k"), col("ts"),
        col("dec").cast("decimal(18,2)").as("dec"), col("arr"),
        col("s"))
    val back = graft.Tables.stagedOrc(spark, dir)(src)
      .orderBy("k").collect()
    assert(back(0).getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"))
    assert(back(1).getTimestamp(1) ==
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0"))
    assert(back(0).getDecimal(2) ==
      new java.math.BigDecimal("12345.67"))
    assert(back(1).getDecimal(2) == new java.math.BigDecimal("-0.01"))
    assert(back(0).getSeq[Float](3) == Seq(1.5f, -2.25f))
    assert(back(1).getSeq[Float](3).isEmpty)
    assert(back(0).getString(4) == "x" && back(1).isNullAt(4))
  }

  test("diffInDiff: an empty arm reads zero means (the den-0 " +
    "convention), counts stay exact") {
    // All users even -> treatment arm empty.
    val ev = Seq(("purchase", 2L, 0L), ("purchase", 2L, 3L),
      ("view", 4L, 0L), ("view", 4L, 3L))
      .map { case (t, u, d) => (t, u, d * DAY) }.toDF("t", "u", "ts")
    val got = EventAnalytics.diffInDiff(ev, "u", "ts", "t", "purchase")
      .collect().head
    // split = (0+3+1)//2 = 2: u2 has pre@0, post@3 -> ctrl means 5e5/5e5
    assert((got.getLong(0), got.getLong(1)) == ((0L, 2L)))
    assert((got.getLong(2), got.getLong(3)) == ((0L, 0L)))
    assert((got.getLong(4), got.getLong(5)) == ((500000L, 500000L)))
    assert(got.getLong(6) == 0L)
  }

  test("katzCentrality: hand-computed attenuation ladder on a chain") {
    // 1->2->3, alpha=1/2, 3 rounds: x1 = (0, 5e5, 5e5),
    // x2 = (0, 0, 25e4), x3 = 0 -> katz (0, 5e5, 75e4)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = GraphRank.katzCentrality(e, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 500000L, 3L -> 750000L))
    graft.Caches.unpersistAll()
  }

  test("property: round-16 surfaces hold their declared invariants " +
    "on seeded random inputs") {
    val rnd = new scala.util.Random(16)
    val day = 86400L * 1000000000L

    // partitionModularity: each q_e12 <= 1e12; Σ in-edges <= m;
    // Σ degree_sum = 2m (every endpoint is labeled here)
    val e = (1 to 300).map(_ => (rnd.nextInt(80).toLong,
      rnd.nextInt(80).toLong)).filter(p => p._1 != p._2).toDF("a", "b")
    val mem = (0 until 80).map(i => (i.toLong, (i % 6).toLong))
      .toDF("node", "lab")
    val mod = GraphRank.partitionModularity(e, "a", "b", mem, "node",
      "lab").collect()
    // the operator distincts DIRECTED pairs; recompute its m the same way
    val mDirected = e.distinct().count()
    mod.foreach(r => assert(r.getLong(4) <= 1000000000000L, r))
    assert(mod.map(_.getLong(2)).sum <= mDirected)
    assert(mod.map(_.getLong(3)).sum == 2 * mDirected)

    // localClustering: triangles <= d(d-1)/2, lcc in [0, 1e6]
    GraphRank.localClustering(e, "a", "b").collect().foreach { r =>
      val (d, t, l) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t <= d * (d - 1) / 2, r)
      assert(l >= 0L && l <= 1000000L, r)
    }
    graft.Caches.unpersistAll()

    // katzCentrality: non-negative; in-degree-0 nodes score exactly 0
    val katz = GraphRank.katzCentrality(e, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hasIn = e.collect().map(_.getLong(1)).toSet
    katz.foreach { case (node, x) =>
      assert(x >= 0L)
      if (!hasIn.contains(node)) assert(x == 0L, s"source node $node")
    }
    graft.Caches.unpersistAll()

    // interpolateDaily: observed rows carry n*1e6; gap rows sit
    // within [min, max] of SOME pair of values (use global bounds)
    val ev = (1 to 500).map(_ => (s"t${rnd.nextInt(4)}",
      rnd.nextInt(30).toLong * day)).toDF("t", "ts")
    val interp = EventAnalytics.interpolateDaily(ev, "t", "ts")
      .collect()
    val vals = interp.filter(_.getBoolean(2)).map(_.getLong(3))
    interp.filter(r => !r.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) >= vals.min && r.getLong(3) <= vals.max, r) }

    // changepointDaily: n_left + n_right = observed days; gain >= -2
    // (one truncation unit per term)
    val cps = EventAnalytics.changepointDaily(ev, "t", "ts").collect()
    val daysPerType = ev.select(col("t"),
        graft.functions.TimeFns.floorDiv(col("ts"), day).as("d"))
      .distinct().groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cps.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == daysPerType(r.getString(0)))
      assert(r.getLong(4) >= -2L, r)
    }

    // brierDecomposition: brier and uncertainty recomputed exactly in
    // BigInt must match the engine; rel/res stay in [0, 1e6] (the
    // 3-term identity is NOT asserted — binned continuous forecasts
    // carry a within-bin-variance residual, see the scaladoc)
    val scRows = (1 to 600).map(_ => (rnd.nextInt(1000001).toLong,
      rnd.nextBoolean()))
    val sc = scRows.toDF("p", "y")
    val br = EvalMetrics.brierDecomposition(sc, "p", "y").collect()(0)
    val (bri, rel, res, unc) =
      (br.getLong(1), br.getLong(2), br.getLong(3), br.getLong(4))
    val nBig = BigInt(scRows.size)
    val expBrier = scRows.map { case (p, y) =>
      val d = BigInt(p) - (if (y) 1000000L else 0L); d * d }.sum /
      (nBig * 1000000L)
    val sy = BigInt(scRows.count(_._2))
    val expUnc = sy * (nBig - sy) * 1000000L / (nBig * nBig)
    assert(BigInt(bri) == expBrier && BigInt(unc) == expUnc,
      s"engine ($bri, $unc) vs recomputed ($expBrier, $expUnc)")
    Seq(rel, res).foreach(v => assert(v >= 0L && v <= 1000000L))

    // oversampleBalanced: every label lands exactly on the target;
    // per-id copy counts within a label differ by at most 1
    val ob = Sampling.oversampleBalanced(
      (1 to 400).map(i => (i.toLong, rnd.nextInt(7).toLong))
        .toDF("vec_id", "label"), "vec_id", "label")
    val perLabel = ob.groupBy("label").count().collect()
      .map(_.getLong(1)).distinct
    assert(perLabel.length == 1, s"unbalanced: ${perLabel.toSeq}")
    ob.groupBy("label", "id").count()
      .groupBy("label").agg(max(col("count")).as("mx"),
        min(col("count")).as("mn"))
      .collect().foreach(r =>
        assert(r.getLong(1) - r.getLong(2) <= 1L, r))

    // generalizationLadder over chained widths (each divides the
    // next): classes merge only -> n_classes and violating rows
    // non-increasing, min class size non-decreasing
    val gl = PrivacyAudit.generalizationLadder(
      (1 to 500).map(_ => (s"c${rnd.nextInt(3)}",
        rnd.nextInt(4000).toLong - 2000L)).toDF("cat", "v"),
      "cat", col("v"), widths = Seq(10L, 100L, 1000L), k = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Seq((10L, 100L), (100L, 1000L)).foreach { case (w1, w2) =>
      assert(gl(w2)._1 <= gl(w1)._1, s"classes grew $w1->$w2")
      assert(gl(w2)._2 >= gl(w1)._2, s"min size shrank $w1->$w2")
      assert(gl(w2)._3 <= gl(w1)._3, s"violating rows grew $w1->$w2")
    }
  }
}
