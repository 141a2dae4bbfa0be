package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{ApproxQuantiles, BudgetSelect, DataCard,
  Decontaminate, Sampling, SimilaritySearch, TextAnalysis}

/** Curation operators: token-budget selection, source mixing,
  * fingerprint overlap, Bloom decontamination, SemDeDup, approx
  * quantiles (round 7); Gopher rule gates, batched retrieval,
  * per-source data card (round 9). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------- budget

  private def costed = (1L to 500L)
    .map(i => (i, (i * 37 % 23) + 1, ((i * 61) % 101).toDouble))
    .toDF("id", "cost", "quality")

  test("selectUnderBudget matches the single-partition window form") {
    val order = Seq(col("quality").desc, col("id").asc)
    val got = BudgetSelect.selectUnderBudget(costed, col("cost"), order,
        budget = 900L, runningOut = "cum")
      .select($"id", $"cum").rowsSet
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = costed.withColumn("cum", sum($"cost").over(w))
      .filter($"cum" <= 900L).select($"id", $"cum").rowsSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("selectUnderBudget is monotonic in budget and partitioning-proof") {
    val order = Seq(col("quality").desc, col("id").asc)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").as[Long].collect().toSet
    val small = ids(BudgetSelect.selectUnderBudget(costed, col("cost"), order, 500L))
    val big = ids(BudgetSelect.selectUnderBudget(costed, col("cost"), order, 2000L))
    assert(small.subsetOf(big), "raising the budget only adds rows")
    val repart = ids(BudgetSelect.selectUnderBudget(
      costed.repartition(13), col("cost"), order, 500L))
    assert(repart == small, "selection must not depend on input partitioning")
    assert(BudgetSelect.selectUnderBudget(costed, col("cost"), order, 0L).isEmpty)
  }

  test("selectUnderBudget counts null costs as zero") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "cost")
    val got = BudgetSelect.selectUnderBudget(df, col("cost"),
        Seq(col("id").asc), budget = 5L)
      .select($"id").as[Long].collect().toSet
    // id=1 spends the budget; id=2 costs nothing and still fits
    assert(got == Set(1L, 2L))
  }

  // ------------------------------------------------------------------ mix

  private def sourced = (1L to 2000L)
    .map(i => (i, s"src${i % 4}"))
    .toDF("id", "source")

  test("mixBySource applies per-source rates, default for the rest") {
    val mixed = Sampling.mixBySource(sourced, "source", "id",
      rates = Map("src0" -> 256, "src1" -> 0), defaultRate256 = 64)
    val bySrc = mixed.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 500, "rate 256 keeps every row of the source")
    assert(!bySrc.contains("src1"), "rate 0 drops the source entirely")
    // default 64/256 = 25% of 500; ±5σ ≈ ±48
    assert(bySrc("src2") > 77 && bySrc("src2") < 173, s"src2=${bySrc("src2")}")
    // per-source decisions are exactly hashSample at that rate
    val viaHash = Sampling.hashSample(
      sourced.filter($"source" === "src2"), "id", 64).rowsSet
    assert(mixed.filter($"source" === "src2").rowsSet == viaHash)
  }

  test("mixBySource is monotonic in the rate (retuning only adds docs)") {
    def kept(r: Int) = Sampling.mixBySource(sourced, "source", "id",
        Map("src3" -> r), defaultRate256 = 0)
      .select($"id").as[Long].collect().toSet
    assert(kept(32).subsetOf(kept(128)))
    assert(kept(128).subsetOf(kept(256)))
  }

  test("mixBySource: null keys excluded, null sources take the default") {
    val df = Seq((Some(1L), Some("a")), (None, Some("a")), (Some(3L), None))
      .toDF("id", "source")
    val all = Sampling.mixBySource(df, "source", "id",
      Map("a" -> 256), defaultRate256 = 256)
    assert(all.select($"id").as[Long].collect().toSet == Set(1L, 3L),
      "null key never sampled; null source falls to the default rate")
  }

  // ----------------------------------------------------- fingerprint pairs

  test("fingerprintOverlapPairs finds substring containment, not boilerplate") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val boiler = "standard license header text appears everywhere verbatim"
    val docs = Seq(
      1L -> s"alpha bravo $shared charlie delta",
      2L -> s"echo foxtrot $shared golf hotel",
      3L -> "completely unrelated content about databases and queries",
      // 6 docs sharing only boilerplate (> maxDocFreq of 5)
      4L -> s"$boiler one", 5L -> s"$boiler two", 6L -> s"$boiler three",
      7L -> s"$boiler four", 8L -> s"$boiler five", 9L -> s"$boiler six"
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.fingerprintOverlapPairs(docs, "doc_id", "text",
      k = 8, w = 4, maxDocFreq = 5L, minShared = 2L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "docs sharing a long run must pair")
    assert(!pairs.exists(p => p._1 >= 4L || p._2 == 3L),
      s"boilerplate-only and unrelated docs must not pair: $pairs")
  }

  test("fingerprintOverlapPairs emits ordered pairs with shared counts") {
    val docs = Seq(
      10L -> "zz shared substring run for the overlap detector zz",
      2L -> "aa shared substring run for the overlap detector aa")
      .toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprintOverlapPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(rows.forall(r => r._1 < r._2))
    assert(rows.forall(_._3 >= 2L))
  }

  // ------------------------------------------------------------- bloom

  test("bloomOverlapReport: per-doc hits dominate the exact counts (no false negatives)") {
    val docs = (1L to 80L).map { i =>
      (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "))
    }.toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 5 === 0)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val exact = Decontaminate.overlapReport(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.2)
      .select($"doc_id", $"n_grams", $"n_hit", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val bloom = Decontaminate.bloomOverlapReport(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.2, fpp = 0.01)
      .select($"doc_id", $"n_grams", $"n_hit", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(exact.keySet == bloom.keySet)
    exact.foreach { case (id, (_, ng, nh, flag)) =>
      assert(bloom(id)._2 == ng, "gram counts are exact")
      assert(bloom(id)._3 >= nh, s"bloom hits can only exceed exact ($id)")
      assert(!flag || bloom(id)._4, s"exact-flagged doc $id must stay flagged")
    }
  }

  // ------------------------------------------------------------ semdedup

  test("semanticNearDup matches the exact kernel on cleanly clustered vectors") {
    // two tight clusters + noise: all true pairs are intra-cluster
    def vec(base: Double, jitter: Double) =
      Array.tabulate(8)(d => (base + jitter * (d + 1)).toFloat)
    val rows = (0L until 40L).map { i =>
      val v = if (i < 6) vec(1.0, 0.01 * i)
        else if (i < 12) vec(-1.0, 0.01 * i)
        else Array.tabulate(8)(d =>
          (math.sin(i * 13.7 + d * 7.3) * 2).toFloat) // scattered
      (i, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = SimilaritySearch.embeddingNearDupExact(df, "vec_id", "embedding",
        threshold = 0.995)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sem = SimilaritySearch.semanticNearDup(df, "vec_id", "embedding",
        threshold = 0.995, nClusters = 4, iterations = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert((sem -- exact).isEmpty, "every emitted pair is cosine-verified")
    assert(exact == sem, s"tight clusters must be fully recalled: " +
      s"missing ${exact -- sem}")
  }

  // ------------------------------------------------------------ quantiles

  test("rankErrorAudit passes per (group, q) on well-formed data") {
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i * 7 % 1009))
      .toDF("grp", "v")
    val out = ApproxQuantiles.rankErrorAudit(df, "grp", col("v").cast("long"),
      qs = Seq(0.25, 0.5, 0.75), accuracy = 10000, maxRankErr = 0.02)
    val rows = out.as[(String, Double, Boolean)].collect()
    assert(rows.length == 9, "one row per (group, quantile)")
    assert(rows.forall(_._3), s"GK at accuracy 10k sits far inside 2%: " +
      rows.filterNot(_._3).mkString(","))
  }

  test("gopherRules: each rule trips on its own fixture") {
    val longOk = (("word " * 60).trim, "ok")            // 60 words, len 4
    val tooShort = ("only three words", "short")        // < 50 words
    val longWords = (Seq.fill(55)("extraordinarily").mkString(" "), "lw")
    val symbols = ((("# " * 30) + ("word " * 30)).trim, "sym")
    val noStop = (("word " * 60).trim, "nostop")
    val df = Seq(longOk, tooShort, longWords, symbols, noStop)
      .zipWithIndex.map { case ((t, tag), i) => (i.toLong, t, tag) }
      .toDF("doc_id", "text", "tag")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .join(df.select($"doc_id", $"tag"), "doc_id")
    val byTag = out.collect().map(r =>
      r.getAs[String]("tag") -> r).toMap
    assert(!byTag("short").getAs[Boolean]("ok_word_count"))
    assert(!byTag("lw").getAs[Boolean]("ok_word_len"),
      "15-char words must fail the mean-word-length ceiling")
    assert(!byTag("sym").getAs[Boolean]("ok_symbol_ratio"))
    assert(!byTag("nostop").getAs[Boolean]("ok_stopwords"))
    // none of the fixtures passes every gate ('ok' has no stopwords
    // either), so assert rule independence instead of a keep row
    assert(byTag("short").getAs[Boolean]("ok_word_len"))
    assert(byTag("sym").getAs[Boolean]("ok_word_count"))
  }

  test("gopherRules: ellipsis runs count once per run") {
    val df = Seq((0L, "wait... what… no....")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
    assert(out.select($"n_symbols").as[Long].head() == 3L)
  }

  test("bruteForceTopKBatch equals per-query bruteForceTopK") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val batch = SimilaritySearch.bruteForceTopKBatch(
      df, "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L), k = 5)
    for (q <- Seq(0L, 1L, 2L)) {
      val single = SimilaritySearch.bruteForceTopK(
          df, "vec_id", "embedding", queryId = q, k = 5)
        .withColumn("query_id", lit(q))
        .select($"query_id", $"vec_id", $"cosine")
      val got = batch.filter($"query_id" === q)
      assert(got.except(single).isEmpty && single.except(got).isEmpty,
        s"query $q: batch and single top-k must agree")
    }
    // partitioning independence (two-phase local/global top-k)
    val re = SimilaritySearch.bruteForceTopKBatch(
      df.repartition(17), "vec_id", "embedding", Seq(0L, 1L, 2L), k = 5)
    assert(re.except(batch).isEmpty && batch.except(re).isEmpty)
  }

  test("bruteForceTopKBatch excludes only self, keeps other queries") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical to query 0
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.bruteForceTopKBatch(
        df, "vec_id", "embedding", Seq(0L), k = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), "query 1's vector is a candidate for query 0")
  }

  test("data card: corpus-wide dup exposure attributed per source") {
    val df = Seq(
      (0L, "same text here", "s1", "en"),
      (1L, "same   TEXT here", "s2", "en"),   // dup of 0 after normalize
      (2L, "unique one", "s1", "en"),
      (3L, "unique two", "s1", "de"),
      (4L, "unique three", "s2", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val out = DataCard.perSource(df, "doc_id", "text", "source", "lang")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_docs") == 3L)
    assert(out("s1").getAs[Long]("n_dup_docs") == 1L,
      "cross-source dup counts in BOTH sources")
    assert(out("s2").getAs[Long]("n_dup_docs") == 1L)
    assert(out("s1").getAs[Long]("n_langs") == 2L)
    assert(out("s2").getAs[Long]("n_langs") == 1L)
  }

  test("source overlap: full pair grid, exact Jaccard, zero pairs kept") {
    val df = Seq(
      (0L, "shared alpha", "s1"), (1L, "shared  ALPHA", "s2"), // dup across s1/s2
      (2L, "shared beta", "s1"), (3L, "shared beta", "s2"),    // dup across s1/s2
      (4L, "only s1", "s1"), (5L, "only s2", "s2"),
      (6L, "only s3", "s3")
    ).toDF("doc_id", "text", "source")
    val out = DataCard.sourceOverlap(df, "doc_id", "text", "source")
      .collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r)
      .toMap
    assert(out.size == 3, "C(3,2) pairs, zero-overlap pairs included")
    val s12 = out(("s1", "s2"))
    assert(s12.getAs[Long]("n_shared") == 2L)
    assert(s12.getAs[Long]("n_a") == 3L && s12.getAs[Long]("n_b") == 3L)
    // Jaccard = 2/(3+3-2) = 0.5 -> 5000 e4-scaled
    assert(s12.getAs[Long]("jaccard_e4") == 5000L)
    assert(out(("s1", "s3")).getAs[Long]("n_shared") == 0L)
    assert(out(("s1", "s3")).getAs[Long]("jaccard_e4") == 0L)
  }

  test("dedup impact: keep-first removal attributed per source") {
    val df = Seq(
      (0L, "dup text", "s1"), (1L, "dup  TEXT", "s2"), // 1 loses to 0
      (2L, "dup text", "s2"),                          // 2 loses to 0
      (3L, "unique a", "s1"), (4L, "unique b", "s2")
    ).toDF("doc_id", "text", "source")
    val out = DataCard.dedupImpact(df, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("n_docs") == 2L)
    assert(out("s1").getAs[Long]("n_removed") == 0L,
      "the survivor (min id) is charged nothing")
    assert(out("s2").getAs[Long]("n_docs") == 3L)
    assert(out("s2").getAs[Long]("n_removed") == 2L)
    assert(out("s2").getAs[Long]("tokens_removed") == 4L,
      "both removed docs are 2 regex tokens each")
  }
}
