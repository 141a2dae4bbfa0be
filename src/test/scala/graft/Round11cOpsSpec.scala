package graft

import org.apache.spark.sql.functions._
import graft.operators.{AggMaintenance, CoOccurrence, Drift, GroupStats,
  PrivacyAudit, Prototypes, Sampling, SnapshotDiff, TextAnalysis}

/** Round-11 batch 3: SCD Type-2 history build, majority-vote label
  * resolution. */
class Round11cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 collapses runs into versioned half-open intervals") {
    // key 1: A A B A — three versions (the second A is a NEW version)
    val df = Seq(
      (1L, 10L, 100L, "A"), (1L, 20L, 101L, "A"),
      (1L, 30L, 102L, "B"), (1L, 40L, 103L, "A"),
      (2L, 10L, 200L, "X"))
      .toDF("k", "ts", "eid", "v")
    val out = SnapshotDiff.scd2History(df, "k", "ts", "v", "eid")
    assert(out.rowsSet == Set(
      Seq(1L, 1L, "A", 10L, 30L, 2L, false),
      Seq(1L, 2L, "B", 30L, 40L, 1L, false),
      Seq(1L, 3L, "A", 40L, null, 1L, true),
      Seq(2L, 1L, "X", 10L, null, 1L, true)))
  }

  test("scd2 run detection is null-safe: null->null is one run, " +
    "value<->null transitions open versions") {
    val df = Seq(
      (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, None), (1L, 40L, 4L, Some("A")))
      .toDF("k", "ts", "eid", "v")
    val out = SnapshotDiff.scd2History(df, "k", "ts", "v", "eid")
    assert(out.rowsSet == Set(
      Seq(1L, 1L, "A", 10L, 20L, 1L, false),
      Seq(1L, 2L, null, 20L, 40L, 2L, false),
      Seq(1L, 3L, "A", 40L, null, 1L, true)))
  }

  test("scd2 same-timestamp events order by the tie column") {
    val df = Seq((1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"))
      .toDF("k", "ts", "eid", "v")
    val out = SnapshotDiff.scd2History(df, "k", "ts", "v", "eid")
    assert(out.rowsSet == Set(
      Seq(1L, 1L, "A", 10L, 10L, 1L, false),
      Seq(1L, 2L, "B", 10L, null, 1L, true)))
  }

  test("majority label: argmax votes with label-asc tie-break and " +
    "exact agreement rate") {
    val df = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),          // clear majority x 2/3
      (2L, "b"), (2L, "a"),                      // tie -> a (label asc)
      (3L, "z"))                                 // unanimous
      .toDF("k", "lab")
    val out = GroupStats.majorityLabel(df, "k", "lab")
    assert(out.rowsSet == Set(
      Seq(1L, "x", 2L, 3L, 2L, 6667L),
      Seq(2L, "a", 1L, 2L, 2L, 5000L),
      Seq(3L, "z", 1L, 1L, 1L, 10000L)))
  }

  test("collocations: adjacent pairs only, minCount filter, exact lift") {
    val docs = Seq(
      (1L, "new york new york is big"),
      (2L, "new york again"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "doc_id", "text",
      minCount = 2L, topK = 10)
    // N=9 tokens; only (new,york) survives minCount (3 occurrences);
    // lift = 3*9/(3*3) = 3.0 exactly
    assert(out.rowsSet == Set(
      Seq("new", "york", 3L, 3L, 3L, 3000000L)))
  }

  test("basket pairs: support counts, exact jaccard, duplicate " +
    "(basket,item) rows collapse") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 1L),   // dup (20,1)
      (30L, 2L), (30L, 3L))
      .toDF("b", "i")
    val out = CoOccurrence.basketPairs(df, "b", "i", minSupport = 1L)
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 2L, 2L, 3L, 666667L),
      Seq(1L, 3L, 1L, 2L, 2L, 333333L),
      Seq(2L, 3L, 2L, 3L, 2L, 666667L)))
  }

  test("basket pairs: oversized baskets are excluded from pairs AND " +
    "frequencies") {
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),   // size 3 > cap
      (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L))
      .toDF("b", "i")
    val out = CoOccurrence.basketPairs(df, "b", "i", minSupport = 1L,
      maxBasketSize = 2)
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 1L, 1L, 2L, 500000L),
      Seq(2L, 3L, 1L, 2L, 1L, 500000L)))
  }

  test("bin drift: reference-rank boundaries, value assignment, exact TVD") {
    val ref = (1L to 10L).toDF("v")
    val cur = Seq(1L, 2L, 6L).toDF("v")
    val out = Drift.binDrift(ref, cur, col("v"), nBins = 2)
    // boundary = 5; ref 5/5, cur 2/1; TVD = (|1/2-2/3|+|1/2-1/3|)/2 = 1/6
    assert(out.rowsSet == Set(
      Seq(0L, 5L, 5L, 2L, 500000L, 666667L, 166667L),
      Seq(1L, null, 5L, 1L, 500000L, 333333L, 166667L)))
  }

  test("bin drift: empty current side yields zero shares, full TVD") {
    val ref = (1L to 4L).toDF("v")
    val cur = spark.range(0).select(col("id").as("v"))
    val out = Drift.binDrift(ref, cur, col("v"), nBins = 2)
    // nCur = 0: share_cur and tvd fall to the guarded 0
    assert(out.rowsSet == Set(
      Seq(0L, 2L, 2L, 0L, 500000L, 0L, 0L),
      Seq(1L, null, 2L, 0L, 500000L, 0L, 0L)))
  }

  test("systematic weighted sample: uniform weights pick every k-th " +
    "row once, total picks exact") {
    val df = (1L to 10L).map(k => (k, 1L)).toDF("k", "w")
    val out = Sampling.systematicWeighted(df, "k", "w", n = 5)
    val picks = out.collect().map(_.getAs[Long]("n_picks"))
    assert(picks.length == 5 && picks.forall(_ == 1L))
  }

  test("systematic weighted sample: heavy rows repeat, zero weights " +
    "never picked, partitioning-invariant") {
    val rows = (1L to 10L).map(k => (k, 1L)) :+ (99L, 100L) :+ (50L, 0L)
    val df = rows.toDF("k", "w")
    val out = Sampling.systematicWeighted(df, "k", "w", n = 5).collect()
    assert(out.map(_.getAs[Long]("n_picks")).sum == 5L)
    assert(out.find(_.getAs[Long]("k") == 99L)
      .exists(_.getAs[Long]("n_picks") >= 4L))
    assert(!out.exists(_.getAs[Long]("k") == 50L))
    val out2 = Sampling.systematicWeighted(df.repartition(7), "k", "w",
      n = 5).collect()
    assert(out.map(_.toSeq).toSet == out2.map(_.toSeq).toSet)
  }

  test("label prototypes: exact e6 means (signed) and e12 variance") {
    val df = Seq(
      (0, Array(1.0f, -0.5f)), (0, Array(0.0f, 0.5f)),
      (1, Array(-2.0f, 1.0f)))
      .toDF("label", "embedding")
    val out = Prototypes.labelPrototypes(df, "embedding", "label")
    assert(out.rowsSet == Set(
      Seq(0L, 1L, 2L, 500000L, 250000000000L),
      Seq(0L, 2L, 2L, 0L, 250000000000L),
      Seq(1L, 1L, 1L, -2000000L, 0L),
      Seq(1L, 2L, 1L, 1000000L, 0L)))
  }

  test("k-anonymity: class sizes, l-diversity, both flags") {
    val df = Seq(
      ("a", 1, 10.0), ("a", 1, 10.0), ("a", 1, 20.0),
      ("b", 2, 30.0))
      .toDF("q1", "q2", "sens")
    val out = PrivacyAudit.kAnonymity(df, Seq("q1", "q2"), "sens",
      k = 3L, l = 2L)
    assert(out.rowsSet == Set(
      Seq("a", 1, 3L, 2L, true, true),
      Seq("b", 2, 1L, 1L, false, false)))
  }

  test("agg-state merge equals full recompute (mergeable-state identity)") {
    val full = Seq((1L, 10L), (1L, 20L), (2L, 5L), (2L, 15L), (3L, 7L))
      .toDF("k", "u")
    val base = AggMaintenance.aggState(
      full.filter(col("u") < 15L), Seq("k"), col("u"))
    val delta = AggMaintenance.aggState(
      full.filter(col("u") >= 15L), Seq("k"), col("u"))
    val merged = AggMaintenance.mergeStates(base, delta, Seq("k"))
    assert(merged.rowsSet == Set(
      Seq(1L, 2L, 30L, 10L, 20L, 15L),
      Seq(2L, 2L, 20L, 5L, 15L, 10L),
      Seq(3L, 1L, 7L, 7L, 7L, 7L)))
  }

  test("agg-state merge: keys on one side only pass through") {
    val base = AggMaintenance.aggState(
      Seq((1L, -10L)).toDF("k", "u"), Seq("k"), col("u"))
    val delta = AggMaintenance.aggState(
      Seq((2L, 4L)).toDF("k", "u"), Seq("k"), col("u"))
    val merged = AggMaintenance.mergeStates(base, delta, Seq("k"))
    assert(merged.rowsSet == Set(
      Seq(1L, 1L, -10L, -10L, -10L, -10L),   // signed mean rounds away
      Seq(2L, 1L, 4L, 4L, 4L, 4L)))
  }

  test("prototype confusion: exact integer NCM assignment with an " +
    "outlier crossing classes") {
    val df = Seq(
      (1L, 0, Array(0.0f, 0.0f)), (2L, 0, Array(0.2f, 0.0f)),
      (5L, 0, Array(1.0f, 1.0f)),              // mislabeled outlier
      (3L, 1, Array(1.0f, 1.0f)), (4L, 1, Array(0.8f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Prototypes.prototypeConfusion(df, "vec_id", "embedding",
      "label")
    assert(out.rowsSet == Set(
      Seq(0L, 0L, 2L), Seq(0L, 1L, 1L), Seq(1L, 1L, 2L)))
  }

  test("reciprocal rank fusion: exact e6 terms, ids missing from a " +
    "ranking contribute nothing") {
    val r1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val r2 = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("id", "rank")
    val out = graft.operators.RankFusion.reciprocalRankFusion(
      Seq(r1, r2), "id", k = 0, topN = 10)
    assert(out.rowsSet == Set(
      Seq(2L, 2L, 1L, 1500000L),
      Seq(1L, 1L, null, 1000000L),
      Seq(3L, 3L, 2L, 833333L),
      Seq(4L, null, 3L, 333333L)))
  }

  test("vocab coverage: conditional checkpoint sums over the " +
    "frequency rank") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text",
      ks = Seq(1, 2))
    assert(out.rowsSet == Set(
      Seq(1L, 1L, 3L, 6L, 500000L),
      Seq(2L, 2L, 5L, 6L, 833333L)))
  }

  test("concordance: snippets shorten at document edges") {
    val docs = Seq((1L, "a scan b"), (2L, "scan x")).toDF("doc_id", "text")
    val out = TextAnalysis.concordance(docs, "doc_id", "text", "scan",
      context = 1)
    assert(out.rowsSet == Set(
      Seq(1L, 1L, "a scan b"),
      Seq(2L, 0L, "scan x")))
    Caches.unpersistAll(blocking = true)
  }

  test("category drift: exact shares and TVD, one-sided categories " +
    "count zero") {
    val ref = Seq("x", "x", "y").toDF("c")
    val cur = Seq("x", "y", "y", "z").toDF("c")
    val out = graft.operators.Drift.categoryDrift(ref, cur, "c")
    assert(out.rowsSet == Set(
      Seq("x", 2L, 1L, 666667L, 250000L, 416667L),
      Seq("y", 1L, 2L, 333333L, 500000L, 416667L),
      Seq("z", 0L, 1L, 0L, 250000L, 416667L)))
    Caches.unpersistAll(blocking = true)
  }

  test("negative edges: bounded ring candidates, true edges excluded, " +
    "deterministic") {
    val nodes = (1L to 10L).map(Tuple1(_)).toDF("id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out0 = graft.operators.NegativeSampling.negativeEdges(
      nodes, "id", none, "id_a", "id_b", ringWidth = 3, perNode = 2)
      .collect()
    assert(out0.nonEmpty && out0.length <= 20)
    assert(out0.forall { r =>
      val d = r.getAs[Long]("ring_dist"); d >= 1L && d <= 3L })
    val asEdges = out0.map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
      .toDF("id_a", "id_b")
    val out1 = graft.operators.NegativeSampling.negativeEdges(
      nodes, "id", asEdges, "id_a", "id_b", ringWidth = 3, perNode = 2)
      .collect()
    val s0 = out0.map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = out1.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s0.intersect(s1).isEmpty)
    Caches.unpersistAll(blocking = true)
  }

  test("functional deps: null rows excluded, violations counted") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")), (Some(2L), Some("a")),
      (Some(3L), None: Option[String]), (None: Option[Long], Some("b")),
      (Some(3L), Some("b")), (Some(3L), Some("c")))
      .toDF("k", "v")
    val out = graft.operators.Profile.functionalDeps(df,
      Seq(("k", "v"), ("v", "k")))
    assert(out.rowsSet == Set(
      Seq("k", "v", 3L, 4L, 1L, false),
      Seq("v", "k", 3L, 4L, 1L, false)))
  }

  test("quantile normalize: endpoint-preserving rank map, singleton " +
    "group maps to pooled midpoint") {
    val df = Seq(
      (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 30L),
      (4L, "g2", 100L))
      .toDF("id", "g", "v")
    val out = graft.operators.QuantileNormalize.quantileNormalize(
      df, "g", col("v"), Seq("id"))
    assert(out.rowsSet == Set(
      Seq(1L, "g1", 10L, 10L),
      Seq(2L, "g1", 20L, 30L),    // r2 of 3 -> pooled rank 3
      Seq(3L, "g1", 30L, 100L),   // endpoint -> pooled max
      Seq(4L, "g2", 100L, 30L)))  // n=1 -> pooled midpoint
    Caches.unpersistAll(blocking = true)
  }

  test("transition matrix: consecutive pairs per user, exact " +
    "conditional probabilities") {
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (2L, 4L, 10L, "a"), (2L, 5L, 20L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.EventAnalytics.transitionMatrix(
      ev, "user_id", "ts", "event_type", "event_id")
    assert(out.rowsSet == Set(
      Seq("a", "b", 1L, 2L, 500000L),
      Seq("a", "a", 1L, 2L, 500000L),
      Seq("b", "a", 1L, 1L, 1000000L)))
  }

  test("weighted median: lower median by cumulative weight, exact") {
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),
      ("h", 1L, 1L), ("h", 2L, 1L))
      .toDF("grp", "v", "w")
    val out = GroupStats.weightedMedian(df, Seq("grp"), col("v"),
      col("w"))
    assert(out.rowsSet == Set(
      Seq("g", 3L, 12L),   // the heavy value carries the mass
      Seq("h", 1L, 2L)))   // even split -> LOWER median
  }

  test("rollup stats: all levels with grouping indicators, exact sums") {
    val docs = Seq(("s1", "en", 10L), ("s1", "de", 20L), ("s2", "en", 30L))
      .toDF("source", "lang", "n_chars")
    val out = graft.operators.Profile.rollupStats(docs,
      Seq("source", "lang"), col("n_chars"))
    assert(out.rowsSet == Set(
      Seq("s1", "en", 0L, 0L, 1L, 10L),
      Seq("s1", "de", 0L, 0L, 1L, 20L),
      Seq("s2", "en", 0L, 0L, 1L, 30L),
      Seq("s1", null, 0L, 1L, 2L, 30L),
      Seq("s2", null, 0L, 1L, 1L, 30L),
      Seq(null, null, 1L, 1L, 3L, 60L)))
  }

  test("session paths: gap splits sessions, paths sorted by (ts, tie)") {
    val ev = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 10L, "b"), (1L, 3L, 2000L, "a"),
      (2L, 4L, 0L, "a"), (2L, 5L, 5L, "b"))
      .toDF("user_id", "event_id", "tss", "event_type")
    val out = graft.operators.Sessionize.sessionPaths(ev, "user_id",
      col("tss"), gapSeconds = 100L, "event_type", col("event_id"),
      topN = 10)
    assert(out.rowsSet == Set(
      Seq("a>b", 2L), Seq("a", 1L)))
  }

  test("cdc apply: latest-wins upsert, delete, insert, passthrough") {
    val base = Seq((1L, "n1", 10.0), (2L, "n2", 20.0), (3L, "n3", 30.0))
      .toDF("k", "name", "bal")
    val log = Seq(
      (2L, 1L, "U", "n2x", 21.0), (2L, 2L, "U", "n2y", 22.0),
      (3L, 1L, "D", "", 0.0),
      (4L, 1L, "U", "n4", 40.0))
      .toDF("k", "seq", "op", "name", "bal")
    val out = graft.operators.CdcApply.applyLog(base, log, "k", "seq",
      "op", Seq("name", "bal"))
    assert(out.rowsSet == Set(
      Seq(1L, "n1", 10.0),
      Seq(2L, "n2y", 22.0),
      Seq(4L, "n4", 40.0)))
  }

  test("gini diversity: exact rational, degenerate group scores zero") {
    val df = Seq(("s1", "a"), ("s1", "a"), ("s1", "b"), ("s2", "a"))
      .toDF("source", "lang")
    val out = GroupStats.giniDiversity(df, "source", "lang")
    assert(out.rowsSet == Set(
      Seq("s1", 3L, 2L, 444444L),   // (9-5)/9
      Seq("s2", 1L, 1L, 0L)))
  }

  test("churn labels: inactivity vs the data-derived horizon") {
    val day = 86400L * 1000000000L
    val ev = Seq((1L, 10L * day), (1L, 9L * day), (2L, 2L * day))
      .toDF("user_id", "ts")
    val out = graft.operators.EventAnalytics.churnLabels(
      ev, "user_id", "ts", horizonDays = 7)
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 10L, 0L, false),
      Seq(2L, 1L, 2L, 8L, true)))
  }

  test("interarrival: per-(user,type) gaps, doubled-units median/MAD " +
    "per type") {
    val s = 1000000000L
    val ev = Seq(
      (1L, 1L, 0L, "t"), (1L, 2L, 10L * s, "t"), (1L, 3L, 30L * s, "t"),
      (2L, 4L, 0L, "t"), (2L, 5L, 10L * s, "t"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.EventAnalytics.interarrivalStats(
      ev, "user_id", "event_type", "ts", "event_id")
    // gaps [10, 20, 10]: median 10 (med2 20), MAD 0 (mad4 0)
    assert(out.rowsSet == Set(Seq("t", 3L, 20L, 0L)))
  }

  test("throttle: drops events within the gap of the previous raw " +
    "event, keeps firsts") {
    val s = 1000000000L
    val ev = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 30L * s, "a"), (1L, 3L, 100L * s, "a"),
      (2L, 4L, 0L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.EventAnalytics.throttle(
      ev, Seq("user_id", "event_type"), "ts", "event_id",
      minGapSeconds = 60L)
    assert(out.select("event_id").rowsSet == Set(
      Seq(1L), Seq(3L), Seq(4L)))
  }

  test("pareto front: strict dominance, (x,y) ties all survive") {
    val df = Seq(
      (1L, 5L, 1L), (2L, 4L, 3L), (3L, 3L, 2L), (4L, 4L, 2L),
      (5L, 5L, 1L))
      .toDF("id", "x", "y")
    val out = graft.operators.Skyline.paretoFront2D(df, col("x"),
      col("y"), Seq("id"))
    // (3,2) dominated by (4,3); (4,2) dominated by (4,3); the two
    // (5,1) rows tie and both survive
    assert(out.rowsSet == Set(
      Seq(1L, 5L, 1L), Seq(5L, 5L, 1L), Seq(2L, 4L, 3L)))
    Caches.unpersistAll(blocking = true)
  }

  test("embedding QA: exact norms, zero and empty flags") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val out = Prototypes.embeddingQa(df, "vec_id", "embedding")
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 1000000000000L, false, false),
      Seq(2L, 2L, 0L, true, false),
      Seq(3L, 0L, 0L, true, true)))
  }

  test("doc keywords: exact lift ranking with minDf filter") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "apple dog"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.docKeywords(docs, "doc_id", "text", k = 2,
      minDf = 2L)
    assert(out.rowsSet == Set(
      Seq(1L, "apple", 2L, 2L, 3000000L, 1L),
      Seq(1L, "banana", 1L, 2L, 1500000L, 2L),
      Seq(2L, "banana", 1L, 2L, 1500000L, 1L),
      Seq(3L, "apple", 1L, 2L, 1500000L, 1L)))
  }

  test("ref integrity: orphans vs null keys accounted separately") {
    val child = Seq(Some(1L), Some(1L), Some(2L), None)
      .map(Tuple1(_)).toDF("ck")
    val parent = Seq(1L).map(Tuple1(_)).toDF("pk")
    val out = graft.operators.Profile.refIntegrity(
      child, "ck", parent, "pk", "c->p")
    assert(out.rowsSet == Set(
      Seq("c->p", 4L, 1L, 1L, 250000L)))
  }

  test("abc classes: the crossing row belongs to the band it starts in") {
    val df = Seq(("g", 1L, 800L), ("g", 2L, 150L), ("g", 3L, 50L))
      .toDF("src", "id", "u")
    val out = graft.operators.AbcClasses.abcClasses(df, "src", "id",
      col("u"))
    assert(out.rowsSet == Set(
      Seq("g", 1L, 800L, 800L, 1000L, "A"),
      Seq("g", 2L, 150L, 950L, 1000L, "B"),
      Seq("g", 3L, 50L, 1000L, 1000L, "C")))
  }

  test("column checksums: order-independent, null-excluding, " +
    "change-detecting") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None))
      .toDF("k", "v")
    val c1 = graft.operators.Profile.columnChecksums(a, Seq("k", "v"))
      .collect().map(_.toSeq).toSet
    val c2 = graft.operators.Profile.columnChecksums(
      a.orderBy(col("k").desc).repartition(5), Seq("k", "v"))
      .collect().map(_.toSeq).toSet
    assert(c1 == c2)
    val b = Seq((1L, Some("x")), (2L, Some("z")), (3L, None))
      .toDF("k", "v")
    val c3 = graft.operators.Profile.columnChecksums(b, Seq("k", "v"))
      .collect().map(_.toSeq).toSet
    assert(c1 != c3)
    assert(c1.find(_.head == "v").exists(_(1) == 2L))   // nulls excluded
  }

  test("freq of freqs: the Good-Turing N_c table") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.freqOfFreqs(docs, "doc_id", "text")
    assert(out.rowsSet == Set(
      Seq(3L, 1L), Seq(2L, 1L), Seq(1L, 1L)))
  }

  test("audio frame energy: exact per-frame integers, sign-extended " +
    "samples, corrupt payloads emit nothing") {
    def le32(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
      ((v >> 24) & 255).toByte)
    def le16(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte)
    def wav(data: Array[Byte]) =
      "RIFF".getBytes("UTF-8") ++ le32(36 + data.length) ++
        "WAVE".getBytes("UTF-8") ++ "fmt ".getBytes("UTF-8") ++
        le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16) ++ "data".getBytes("UTF-8") ++
        le32(data.length) ++ data
    val samples = Array(100, -100, 1000, 30000)
    val data = samples.flatMap(s => le16(s & 0xffff))
    val df = Seq((1L, wav(data)), (2L, "nope".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = graft.operators.Multimodal.frameEnergy(df, "id",
      "payload", frameSamples = 2)
    assert(out.rowsSet == Set(
      Seq(1L, 0L, 2L, 20000L, 100L),
      Seq(1L, 1L, 2L, 901000000L, 30000L)))
  }

  test("quantile grid: value at rank ceil(q*n/1000), observed values " +
    "only") {
    val df = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val out = GroupStats.quantileGrid(df, Seq("grp"), col("v"),
      permilles = Seq(250, 500, 750, 950))
    assert(out.rowsSet == Set(Seq("g", 10L, 3L, 5L, 8L, 10L)))
  }

  test("first digit profile: positives only, exact shares") {
    val df = Seq(10L, 95L, 123L, 950L, -5L, 0L).toDF("v")
    val out = graft.operators.Profile.firstDigitProfile(df, col("v"))
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 4L, 500000L),
      Seq(9L, 2L, 4L, 500000L)))
  }

  test("compressibility: RLE transitions per position, exact ratio") {
    val docs = Seq((1L, "aaab"), (2L, "ab"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressibility(docs, "doc_id", "text")
    assert(out.rowsSet == Set(
      Seq(1L, 4L, 2L, 5000L),
      Seq(2L, 2L, 2L, 10000L),
      Seq(3L, 1L, 1L, 10000L)))
  }

  test("dup gram share: instances of cross-doc grams over all " +
    "instances") {
    val docs = Seq((1L, "x y z w"), (2L, "x y z q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dupGramShare(docs, "doc_id", "text", n = 3)
    assert(out.rowsSet == Set(Seq(3L, 4L, 2L, 500000L)))
  }

  test("join fanout: exact products per matched key + corpus totals") {
    val l = Seq(1L, 1L, 2L).map(Tuple1(_)).toDF("k")
    val r = Seq(1L, 2L, 2L, 3L).map(Tuple1(_)).toDF("k")
    val out = graft.operators.Profile.joinFanout(l, "k", r, "k")
    assert(out.rowsSet == Set(
      Seq(1L, 2L, 1L, 2L, 4L, 2L),
      Seq(2L, 1L, 2L, 2L, 4L, 2L)))
    Caches.unpersistAll(blocking = true)
  }
}
