package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-17 operator semantics. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeComponentMap == full recompute: bridged components, brand-" +
    "new nodes, and a delta node that becomes the new component min") {
    // standing graph: {1,2,3} (comp 1), {10,11} (comp 10), {20,21}
    // (comp 20)
    val standing = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    // delta: bridges comps 1 and 10 (3-10), adds fresh pair (30,31),
    // and attaches node 0 to comp 20 — 0 < 20, so the merged label of
    // {0,20,21} must be the NEW min, not the staged one
    val delta = Seq((3L, 10L), (30L, 31L), (0L, 21L)).toDF("id_a", "id_b")
    val staged = Dedup.connectedComponents(standing, "id_a", "id_b")
    val merged = Dedup.mergeComponentMap(staged, delta, "id_a", "id_b")
    val full = Dedup.connectedComponents(
      standing.unionByName(delta), "id_a", "id_b")
    assert(merged.rowsSet == full.rowsSet, "merge must equal recompute")
    assert(merged.rowsSet == Set(
      Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(10L, 1L), Seq(11L, 1L),
      Seq(20L, 0L), Seq(21L, 0L), Seq(0L, 0L),
      Seq(30L, 30L), Seq(31L, 30L)))
  }

  test("recursiveLDiversity: dominance verdict by exact cross-" +
    "multiplication, deterministic frequency ranks") {
    // X: a×5, b×2, c×2, d×1 -> r1=5, tail from rank 3 = c+d = 3,
    //    5 < 1·3 false. Y: a,b,c,d ×2 -> r1=2, tail = 4, 2 < 4 true.
    val rows = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c")
        ++ Seq("d")).map(("X", _)) ++
      Seq("a", "a", "b", "b", "c", "c", "d", "d").map(("Y", _))
    val df = rows.toDF("seg", "sv")
    val got = PrivacyAudit.recursiveLDiversity(df, Seq("seg"), "sv",
      l = 3, cNum = 1L, cDen = 1L).rowsSet
    assert(got == Set(
      Seq("X", 10L, 4L, 5L, 3L, false),
      Seq("Y", 8L, 4L, 2L, 4L, true)))
  }

  test("harmonicCentrality: hand-computed truncated reciprocal sums " +
    "on a path graph, landmark form") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("node")
    val got = GraphRank.harmonicCentrality(edges, "src", "dst",
      seeds, "node", maxHops = 3).rowsSet
    // seed 1: d(2)=1, d(3)=2, d(4)=3 -> 1000000+500000+333333
    // seed 3: d(2)=d(4)=1, d(1)=d(5)=2 -> 2·1000000+2·500000
    assert(got == Set(Seq(1L, 3L, 1833333L), Seq(3L, 4L, 3000000L)))
  }

  test("kendallDailyPairs: sign census over aligned day pairs, " +
    "truncating tau quotient") {
    val DAY = 86400L * 1000000000L
    // A daily counts 1,2,3; B daily counts 1,3,2 over days 0,1,2
    def burst(t: String, day: Long, n: Int) =
      Seq.fill(n)((t, day * DAY + 1L))
    val ev = (burst("A", 0, 1) ++ burst("A", 1, 2) ++ burst("A", 2, 3) ++
      burst("B", 0, 1) ++ burst("B", 1, 3) ++ burst("B", 2, 2))
      .toDF("t", "ts")
    val got = EventAnalytics.kendallDailyPairs(ev, "t", "ts").rowsSet
    // day pairs: (0,1) concordant, (0,2) concordant, (1,2) discordant
    assert(got == Set(Seq("A", "B", 3L, 2L, 1L, 0L, 333333L)))
  }

  test("dowSeasonality: lower-median per (type, dow), worst residual") {
    val DAY = 86400L * 1000000000L
    def burst(day: Long, n: Int) = Seq.fill(n)(("A", day * DAY + 1L))
    // dow 0 (days 0,7,14): counts 1,2,9 -> median 2, max resid 7
    // dow 1 (day 1): count 4 -> median 4, resid 0
    val ev = (burst(0, 1) ++ burst(7, 2) ++ burst(14, 9) ++ burst(1, 4))
      .toDF("t", "ts")
    val got = EventAnalytics.dowSeasonality(ev, "t", "ts").rowsSet
    assert(got == Set(
      Seq("A", 0L, 3L, 2L, 7L),
      Seq("A", 1L, 1L, 4L, 0L)))
  }

  test("rangeCountFromKeys: identical vectors collide in every band " +
    "and count; orthogonal candidates fall to the cosine verify") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val keys = SimilaritySearch.bandKeyRows(vecs, "vec_id", "embedding",
      baseBits = 64, bands = 8, bitsPerBand = 8)
    val got = SimilaritySearch.rangeCountFromKeys(keys, vecs,
      "vec_id", "embedding", Seq(0L).toDF("vec_id"), "vec_id",
      threshold = 0.5).rowsSet
    assert(got == Set(Seq(0L, 1L, 10000L)))
  }

  test("weightedJaccardPairs: N div df integer weights, cross-" +
    "multiplied threshold, exact e6 score") {
    // shingles — d1/d2: {a b c, b c d}; d3: {a b c, b c q}. N=3,
    // w(a b c)=3//3=1, w(b c d)=3//2=1, w(b c q)=3//1=3.
    // sums: d1=d2=2, d3=4. (1,2): inter 2, union 2 -> 1.0 kept;
    // (1,3)/(2,3): inter 1, union 5 -> 0.2 dropped at 1/2.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c q"))
      .toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      n = 3, thrNum = 1L, thrDen = 2L).rowsSet
    assert(got == Set(Seq(1L, 2L, 2L, 2L, 1000000L)))
  }

  test("kTruss: K4 survives k=4 peeling, a lone triangle and a pendant " +
    "chain peel away; k=3 keeps the triangle") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val tri = Seq((7L, 8L), (8L, 9L), (7L, 9L))
    val chain = Seq((4L, 15L), (15L, 16L))
    val edges = (k4 ++ tri ++ chain).toDF("a", "b")
    val t4 = GraphRank.kTruss(edges, "a", "b", k = 4).rowsSet
    assert(t4 == k4.map { case (u, v) => Seq(u, v, 2L) }.toSet,
      "k=4: exactly the K4 edges, each with support 2")
    val t3 = GraphRank.kTruss(edges, "a", "b", k = 3).rowsSet
    assert(t3 == (k4.map { case (u, v) => Seq(u, v, 2L) } ++
      tri.map { case (u, v) => Seq(u, v, 1L) }).toSet,
      "k=3: K4 plus the triangle; the pendant chain peels")
  }

  test("kTruss converges past any fixed horizon: a triangle strip under " +
    "k=4 unravels one step per round (peel depth > 3), only the K5 " +
    "survives (r17 verdict #4)") {
    // strip: nodes 1..8, edges (i,i+1) and (i,i+2) — triangles
    // (i,i+1,i+2). Under k=4 each end edge has 1 supporting triangle,
    // peels, and exposes the next: a 4-round cascade a fixed rounds=3
    // contract would silently leave half-peeled.
    val strip = (1L to 7L).map(i => (i, i + 1)) ++
      (1L to 6L).map(i => (i, i + 2))
    val k5 = for (i <- 101L to 105L; j <- (i + 1) to 105L) yield (i, j)
    val edges = (strip ++ k5).toDF("a", "b")
    val got = GraphRank.kTruss(edges, "a", "b", k = 4).rowsSet
    assert(got == k5.map { case (u, v) => Seq(u, v, 3L) }.toSet,
      "the whole strip must unravel; K5 edges each keep support 3")
    // the cap is enforced, not advisory: too small a horizon throws
    // instead of returning the half-peeled strip
    val e = intercept[IllegalStateException] {
      GraphRank.kTruss(edges, "a", "b", k = 4, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("rollup grouping sets: grouping_id separates a REAL null from " +
    "a subtotal null") {
    val df = Seq(("A", Option("X")), ("A", Option.empty[String]),
      ("B", Option("X"))).toDF("f", "s")
    val got = df.rollup(col("f"), col("s"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid")).rowsSet
    assert(got == Set(
      Seq("A", "X", 1L, 0L), Seq("A", null, 1L, 0L),   // real null, gid 0
      Seq("B", "X", 1L, 0L),
      Seq("A", null, 2L, 1L), Seq("B", null, 1L, 1L),  // subtotals
      Seq(null, null, 3L, 3L)))                        // grand total
  }

  test("theilSen: maxDays guard fails loudly on an over-long daily " +
    "series instead of queuing the O(D^2) pair join") {
    val DAY = 86400L * 1000000000L
    val ev = (0L until 5L).map(d => ("A", d * DAY, d)).toDF("t", "ts", "eid")
    // 5 daily points, maxDays = 3 -> the lazy raise_error fires
    val e = intercept[Exception] {
      EventAnalytics.theilSen(ev, "t", "ts", maxDays = 3).collect()
    }
    assert(e.getMessage.contains("maxDays") ||
      Option(e.getCause).exists(_.getMessage.contains("maxDays")))
    // the default bound admits the same series and stays exact:
    // counts are constant 1/day -> slope 0, C(5,2)=10 pairs
    val ok = EventAnalytics.theilSen(ev, "t", "ts").rowsSet
    assert(ok == Set(Seq("A", 10L, 0L)))
  }

  test("mergeComponentMap: empty delta is the identity; empty staged " +
    "map degrades to plain connectedComponents of the delta") {
    val standing = Seq((5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val staged = Dedup.connectedComponents(standing, "id_a", "id_b")
    val none = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.mergeComponentMap(staged, none, "id_a", "id_b").rowsSet
      == staged.rowsSet, "empty delta must preserve the staged map")
    val emptyStaged = Dedup.connectedComponents(none, "id_a", "id_b")
    assert(Dedup.mergeComponentMap(emptyStaged,
        standing, "id_a", "id_b").rowsSet == staged.rowsSet,
      "empty staged map must equal a from-scratch build of the delta")
  }
}
