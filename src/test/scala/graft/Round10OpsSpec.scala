package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventAnalytics, FuzzyJoin, Sampling}

/** Round-10 operators: asymmetric containment pairs, blocked fuzzy
  * join, per-group percentile-band trim, burst detection, rolling
  * distinct actives. Each test compares the operator against an
  * independent brute-force formulation of the same semantics. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- containment

  private def shingles(text: String, n: Int): Set[String] = {
    val ws = text.toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").trim.split("\\s+").toSeq
    if (ws.length < n) Set.empty
    else ws.sliding(n).map(_.mkString(" ")).toSet
  }

  test("containmentPairs matches the brute-force set formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog tonight and sleeps"),
      (3L, "a completely different sentence with other words entirely"),
      (4L, "quick brown fox jumps over"),
      (5L, "short text here")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, thrNum = 6, thrDen = 10)
      .select($"doc_a", $"doc_b", $"inter", $"n_a", $"n_b").rowsSet
    val sets = docs.collect().map(r =>
      r.getLong(0) -> shingles(r.getString(1), 3)).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toLong
      if sets(a).nonEmpty && sets(b).nonEmpty
      if inter * 10 >= 6 * math.min(sets(a).size, sets(b).size)
    } yield Seq[Any](a, b, inter, sets(a).size.toLong, sets(b).size.toLong))
      .toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce at least one pair")
  }

  test("containmentPairs scores subset duplication Jaccard underweights") {
    // doc 4 is fully contained in doc 1's shingle set: cont = 1.0 (e4
    // = 10000) even though Jaccard is small
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then some more words here"),
      (4L, "quick brown fox jumps over")).toDF("doc_id", "text")
    val row = Dedup.containmentPairs(docs, "doc_id", "text", n = 3)
      .select($"doc_a", $"doc_b", $"cont_a_e4", $"cont_b_e4")
      .collect()
    assert(row.length == 1)
    // b is the smaller set and fully contained
    assert(row(0).getLong(3) == 10000L)
  }

  // --------------------------------------------------------- fuzzy join

  test("byEditDistance matches brute-force blocked levenshtein") {
    val parts = Seq(
      (1L, "azure metallic plum"),
      (2L, "azure metallic plus"),   // dist 1 from #1
      (3L, "azure metalic plum"),    // dist 1 from #1, 2 from #2
      (4L, "azure something else"),  // same block, far
      (5L, "rosy metallic plum"),    // different block
      (6L, "azure metallic plum")    // exact dup of #1: excluded
    ).toDF("p_partkey", "p_name")
    val got = FuzzyJoin.byEditDistance(parts, "p_partkey", "p_name",
        maxDist = 3, minDist = 1)
      .select($"key_a", $"key_b", $"lev").rowsSet
    val rows = parts.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ka, na) <- rows; (kb, nb) <- rows if ka < kb
      if na.split(" ")(0).toLowerCase == nb.split(" ")(0).toLowerCase
      d = lev(na, nb) if d >= 1 && d <= 3
    } yield Seq[Any](ka, kb, d.toLong)).toSet
    assert(got == want)
    assert(got.contains(Seq[Any](1L, 2L, 1L)))
    assert(!got.exists(r => r(0) == 1L && r(1) == 6L), "exact dups excluded")
    assert(!got.exists(r => r.contains(5L)), "cross-block pairs excluded")
  }

  test("byEditDistance bag prune is lossless: anagrams, case, fuzz " +
      "(r20 kernel prune internals)") {
    // The r20 letter-bag prune (lev >= bagL1/2 over the a-z subset)
    // must never drop a true pair: anagram tails have bagL1 = 0 but
    // lev > 0 (prune MUST pass them through to the DP kernel), and
    // uppercase/digit edits are invisible to the a-z bag (bagL1
    // underestimates — still a valid lower bound, never an over-
    // estimate). Brute force is the arbiter, as in the test above.
    val rnd = new scala.util.Random(42)
    val vocab = Seq("abc", "acb", "bca", "xyz", "xYz", "x1z", "qrs")
    val fuzz = (100L to 160L).map { i =>
      (i, "blk " + Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val parts = (Seq(
      (1L, "blk listen stop"),
      (2L, "blk silent stop"),   // tail anagram: bagL1 = 0, lev = 4 (out)
      (3L, "blk listen spot"),   // "stop"->"spot": bagL1 = 0, lev = 2 (in)
      (4L, "blk Listen stop"),   // one case edit: invisible to the bag
      (5L, "blk l1sten stop")    // digit edit: invisible to the bag
    ) ++ fuzz).toDF("p_partkey", "p_name")
    val got = FuzzyJoin.byEditDistance(parts, "p_partkey", "p_name",
        maxDist = 3, minDist = 1)
      .select($"key_a", $"key_b", $"lev").rowsSet
    val rows = parts.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ka, na) <- rows; (kb, nb) <- rows if ka < kb
      if na.split(" ")(0).toLowerCase == nb.split(" ")(0).toLowerCase
      d = lev(na, nb) if d >= 1 && d <= 3
    } yield Seq[Any](ka, kb, d.toLong)).toSet
    assert(got == want)
    assert(got.contains(Seq[Any](1L, 3L, 2L)), "anagram-tail pair kept")
    assert(got.contains(Seq[Any](1L, 4L, 1L)), "case-edit pair kept")
    assert(got.contains(Seq[Any](1L, 5L, 1L)), "digit-edit pair kept")
  }

  test("byEditDistance maxBlockSize drops hot blocks") {
    val parts = ((1L to 20L).map(i => (i, s"hot name $i")) :+ (21L, "cold nam")
      :+ (22L, "cold name")).toDF("p_partkey", "p_name")
    val got = FuzzyJoin.byEditDistance(parts, "p_partkey", "p_name",
      maxDist = 3, minDist = 1, maxBlockSize = 5L)
    assert(got.select($"key_a").as[Long].collect().toSet == Set(21L))
  }

  // ---------------------------------------------------- percentile band

  test("percentileBand keeps exactly the (p10, p90] rank slice per group") {
    val df = (1L to 200L).map(i => (i, s"s${i % 3}", (i * 131) % 997))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.percentileBand(df, "source", "n_chars", "doc_id",
      loPct = 10, hiPct = 90).select($"doc_id").as[Long].collect().toSet
    val want = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).values.flatMap { g =>
        val sorted = g.sortBy(t => (t._3, t._1))
        val n = sorted.length
        sorted.zipWithIndex.collect {
          case (t, i) if (i + 1) * 100 > 10 * n && (i + 1) * 100 <= 90 * n =>
            t._1
        }
      }.toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < 200)
    // partitioning must not change the cut
    val repart = Sampling.percentileBand(df.repartition(13), "source",
      "n_chars", "doc_id").select($"doc_id").as[Long].collect().toSet
    assert(repart == got)
  }

  // ------------------------------------------------------------- bursts

  test("burstHours flags spikes against the trailing observed-hour mean") {
    // type A: 24 calm hours of 10 events, then an hour of 25 (spike),
    // then an hour of 11 (no spike). Hours as nanos.
    def at(h: Long, k: Int) = (0 until k).map(_ => ("A", h * 3600L * 1000000000L))
    val rows = (0L until 24L).flatMap(at(_, 10)) ++ at(24L, 25) ++ at(25L, 11)
    val ev = rows.toDF("event_type", "ts")
    val got = EventAnalytics.burstHours(ev, "event_type", "ts",
        trailingHours = 24, minTrailing = 12, multNum = 2, multDen = 1)
      .select($"hour_start", $"n_events", $"trail_n", $"trail_sum").rowsSet
    // hour 24: trailing 24 observed hours sum 240, 25*24 >= 2*240
    assert(got == Set(Seq[Any](24L * 3600L, 25L, 24L, 240L)))
  }

  test("burstHours needs minTrailing observed hours of baseline") {
    val rows = (0L until 5L).flatMap(h =>
      (0 until 10).map(_ => ("A", h * 3600L * 1000000000L))) ++
      (0 until 100).map(_ => ("A", 5L * 3600L * 1000000000L))
    val got = EventAnalytics.burstHours(rows.toDF("event_type", "ts"),
      "event_type", "ts", trailingHours = 24, minTrailing = 12)
    assert(got.isEmpty, "5 trailing hours < minTrailing=12 suppresses the flag")
  }

  // ----------------------------------------------------- rolling actives

  test("rollingActiveUsers matches the brute-force range formulation") {
    val rows = Seq((1L, 0L), (1L, 3L), (2L, 0L), (2L, 10L), (3L, 8L),
      (1L, 10L), (4L, 2L))
      .map { case (u, d) => (u, d * 86400L * 1000000000L) }
    val got = EventAnalytics.rollingActiveUsers(
        rows.toDF("user_id", "ts"), "user_id", "ts", windowDays = 7)
      .rowsSet
    val ud = rows.map { case (u, ns) => (u, ns / 1000000000L / 86400L) }.distinct
    val days = ud.map(_._2).distinct
    val want = days.map { t =>
      Seq[Any](t, ud.filter(p => p._2 >= t - 6 && p._2 <= t).map(_._1)
        .distinct.size.toLong)
    }.toSet
    assert(got == want)
    // day 8 sees users active on days 2,3,8 -> {1, 3, 4}
    assert(got.contains(Seq[Any](8L, 3L)))
  }

  test("rollingActiveUsers ignores null users and dedups within window") {
    val rows = Seq((Some(1L), 0L), (None, 0L), (Some(1L), 1L))
      .map { case (u, d) => (u, d * 86400L * 1000000000L) }
    val got = EventAnalytics.rollingActiveUsers(
        rows.toDF("user_id", "ts"), "user_id", "ts", windowDays = 7)
      .rowsSet
    assert(got == Set(Seq[Any](0L, 1L), Seq[Any](1L, 1L)))
  }

  // ------------------------------------------------------- source cap

  test("capPerGroup keeps the best `cap` rows per group, ties by id") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L), (6L, "b", 60L),
      (7L, "c", 10L)).toDF("doc_id", "src", "quality")
    val got = Sampling.capPerGroup(docs, "src", "quality", "doc_id", cap = 2)
      .rowsSet
    // group a: quality 300 ties between ids 2 and 4 -> lower id wins
    // alongside; 3 (200) and 1 (100) are cut. b and c keep everything.
    assert(got == Set(
      Seq[Any](2L, "a", 300L), Seq[Any](4L, "a", 300L),
      Seq[Any](5L, "b", 50L), Seq[Any](6L, "b", 60L),
      Seq[Any](7L, "c", 10L)))
  }

  // ----------------------------------------------------- training-set QA

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  private val labeledVecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0.8f, 0.2f, 0f, 0f), 1),
    (3L, Array(0f, 1f, 0f, 0f), 1),
    (4L, Array(0f, 0.9f, 0.1f, 0f), 2),
    (5L, Array(0f, 0f, 1f, 0f), 2),
    (6L, Array(0.7f, 0.3f, 0f, 0f), 2))

  test("hardNegativesBatch returns top-k cross-label only") {
    val df = labeledVecs.toDF("vec_id", "embedding", "label")
    val got = graft.operators.SimilaritySearch.hardNegativesBatch(
        df, "vec_id", "embedding", "label", queryIds = Seq(0L, 3L), k = 2)
      .select($"query_id", $"vec_id", $"neg_label").rowsSet
    val byId = labeledVecs.map(v => v._1 -> v).toMap
    val want = Seq(0L, 3L).flatMap { qid =>
      val (_, qv, ql) = byId(qid)
      labeledVecs.filter(_._3 != ql)
        .map { case (id, v, lab) =>
          (id, lab, BigDecimal(cos(qv, v)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP)) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(2)
        .map { case (id, lab, _) => Seq[Any](qid, id, lab.toLong) }
    }.toSet
    assert(got == want)
    // anchor 0 (label 0): best cross-label neighbors are 2 then 6
    assert(got.contains(Seq[Any](0L, 2L, 1L)))
    assert(got.contains(Seq[Any](0L, 6L, 2L)))
  }

  test("crossLabelNearDup keeps only disagreeing-label near pairs") {
    val df = labeledVecs.toDF("vec_id", "embedding", "label")
    val got = graft.operators.SimilaritySearch.crossLabelNearDup(
        df, "vec_id", "embedding", "label", threshold = 0.9)
      .select($"id_a", $"id_b", $"label_a", $"label_b").rowsSet
    val byId = labeledVecs.map(v => v._1 -> v).toMap
    val want = (for {
      a <- labeledVecs.map(_._1); b <- labeledVecs.map(_._1) if a < b
      if cos(byId(a)._2, byId(b)._2) >= 0.9
      if byId(a)._3 != byId(b)._3
    } yield Seq[Any](a, b, byId(a)._3.toLong, byId(b)._3.toLong)).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce cross-label near pairs")
    // 0~1 are near but SAME label: must be absent
    assert(!got.exists(r => r.head == 0L && r(1) == 1L))
  }
}
