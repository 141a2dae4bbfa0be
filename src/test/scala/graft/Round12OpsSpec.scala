package graft

import org.apache.spark.sql.functions._
import graft.operators.{BpeTrain, Decontaminate, GroupStats,
  RetrievalEval, SimilaritySearch}

/** Round-12 operators: retrieval metrics, semantic decontamination,
  * matryoshka ANN, trimmed mean, BPE merge training. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // tiny embedding fixture: 3 labels, hash-derived 8-dim vectors plus
  // two PLANTED near-identical pairs (ids 0/100 and 1/101)
  private lazy val vecs = {
    val base = (0L until 120L).map { i =>
      val src = if (i >= 100) i - 100 else i
      val v = (0 until 8).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((src, d))
        (h % 1000) / 1000.0f +
          (if (i >= 100) 0.001f * (d % 3) else 0f)
      }.toArray
      (i, v, (src % 3).toInt)
    }
    base.toDF("vec_id", "embedding", "label")
  }

  test("relevanceMetrics: rank-1 self-twin drives MRR and nDCG") {
    val m = RetrievalEval.relevanceMetrics(vecs, "vec_id", "embedding",
      "label", queryIds = Seq(0L, 1L), k = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // query 0's planted twin (id 100) shares label 0 and is the
    // nearest vector -> first_rel_rank = 1, rr = 1e6
    val q0 = m(0L)
    assert(q0.getLong(2) == 1L, s"first_rel_rank ${q0.getLong(2)}")
    assert(q0.getLong(3) == 1000000L)
    // recall/ndcg are exact scaled ints within [0, 1e6]
    m.values.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
      assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000L)
    }
    // dcg <= idcg identity backs the ndcg <= 1 bound
    val w = RetrievalEval.dcgWeightsE9(10)
    assert(w.toSeq == w.sorted(Ordering[Long].reverse).toSeq,
      "weights must decay")
    assert(RetrievalEval.idcgPrefixE9(10).last == w.sum)
  }

  test("semanticReport flags the planted twin and only scans bench") {
    val bench = vecs.filter($"vec_id" >= 100L)
    val corpus = vecs.filter($"vec_id" < 100L)
    val rep = Decontaminate.semanticReport(corpus, bench,
      "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rep.size == 100)
    // ids 0 and 1 have near-identical bench twins -> contaminated
    assert(rep(0L).getBoolean(3) && rep(1L).getBoolean(3))
    assert(rep(0L).getLong(2) >= 1L)
    // a max_cosine is always reported, even when clean
    assert(rep.values.forall(r => !r.isNullAt(1)))
  }

  test("matryoshkaTopKRefined returns full-dim cosines, k rows") {
    val top = SimilaritySearch.matryoshkaTopKRefined(vecs, "vec_id",
      "embedding", queryId = 0L, k = 5, prefixDim = 4, shortlist = 30)
      .collect()
    assert(top.length == 5)
    // the planted twin must survive the prefix shortlist (its PREFIX
    // is also near-identical) and rank first on the full-dim re-rank
    assert(top.head.getLong(0) == 100L)
    val cosines = top.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse, "descending cosine order")
  }

  test("trimmedMean trims exactly floor(n/10) per side and averages") {
    // group A: 1..10 plus outliers -1000 and 1000 => n=12, t=1,
    // kept = sorted(2nd..11th) = 1..10 -> mean 5.5
    val df = ((1 to 10).map(v => ("A", v.toLong)) ++
      Seq(("A", -1000L), ("A", 1000L), ("B", 7L))).toDF("g", "u")
    val out = GroupStats.trimmedMean(df, Seq("g"), col("u"), 1, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(1) == 12L && out("A").getLong(2) == 10L)
    assert(out("A").getLong(3) == 55L)
    assert(out("A").getLong(4) == 55000L) // 5.5 e4
    // B: n=1, t=0 -> untouched
    assert(out("B").getLong(2) == 1L && out("B").getLong(4) == 70000L)
  }

  test("BPE learns the dominant pair first and applies it greedily") {
    // 'aaab' x3 + 'ab': pairs round1: (a,a) cnt 6, (a,b) cnt 4
    // round1 merges (a,a) -> 'aa a b' (left-to-right non-overlapping)
    // round2 pairs: (aa,a) 3, (a,b) 4 -> merges (a,b)
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val m = BpeTrain.topMerges(docs, "doc_id", "text", rounds = 2)
      .orderBy($"merge_rank").collect()
    assert(m.length == 2)
    assert((m(0).getString(1), m(0).getString(2)) == ("a", "a"))
    assert(m(0).getLong(4) == 6L)
    assert((m(1).getString(1), m(1).getString(2)) == ("a", "b"))
    assert(m(1).getLong(4) == 4L)
    assert(m(1).getString(3) == "ab")
  }

  test("BPE stops early when no adjacent pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val m = BpeTrain.topMerges(docs, "doc_id", "text", rounds = 3)
    assert(m.count() == 0L, "single-char words have no pairs")
  }

  test("concentration: uniform vs dominated corpora order as expected") {
    import graft.operators.Profile
    val uniform = (1 to 4).flatMap(s => (1 to 25).map(i =>
      (s"s$s", 100L))).toDF("source", "w")
    val skewed = ((1 to 97).map(_ => ("big", 100L)) ++
      Seq(("a", 100L), ("b", 100L), ("c", 100L))).toDF("source", "w")
    val u = Profile.concentration(uniform, "source", col("w")).head()
    val k = Profile.concentration(skewed, "source", col("w")).head()
    assert(u.getLong(0) == 4L && u.getLong(2) == 250000L) // HHI = 1/4
    assert(k.getLong(2) > 900000L, s"dominated HHI ${k.getLong(2)}")
    assert(k.getLong(3) == 970000L) // CR1 = 97%
    assert(u.getLong(4) == 1000000L) // CR4 of 4 groups = everything
  }

  test("incremental embedding near-dup equals the batch-relevant slice " +
    "of a full rebuild, from a staged store") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spec-embkeys").toString
    val standing = vecs.filter($"vec_id" < 100L)
    val batch = vecs.filter($"vec_id" >= 100L)
    val keys = SimilaritySearch.stagedBandKeys(standing, "vec_id",
      "embedding", dir, baseBits = 128, bands = 16, bitsPerBand = 8)
    val inc = SimilaritySearch.incrementalEmbeddingNearDup(keys, vecs,
      batch, "vec_id", "embedding", threshold = 0.999,
      baseBits = 128, bands = 16, bitsPerBand = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // planted twins (0,100) and (1,101) are near-identical: the probe
    // must surface them (identical vectors share every band key)
    assert(inc.contains((0L, 100L)) && inc.contains((1L, 101L)))
    // every pair has a batch endpoint
    assert(inc.forall { case (a, b) => a >= 100L || b >= 100L })
    // the store is reused, not rebuilt: second call reads parquet
    val again = SimilaritySearch.stagedBandKeys(standing, "vec_id",
      "embedding", dir, baseBits = 128, bands = 16, bitsPerBand = 8)
    assert(again.count() == keys.count())
  }

  test("groupTopK keeps exactly k per group in total order") {
    import graft.operators.RankOps
    val df = (1 to 100).map(i => (s"g${i % 4}", i.toLong, (i * 13 % 50).toLong))
      .toDF("g", "id", "v")
    val top = RankOps.groupTopK(df, Seq("g"), 3, col("v"), Seq(col("id")))
      .collect()
    assert(top.length == 12)
    top.groupBy(_.getString(0)).foreach { case (g, rows) =>
      assert(rows.length == 3, s"$g")
      val ranked = rows.sortBy(_.getLong(3))
      // descending value, id tie-break ascending
      ranked.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1)))
      }
    }
  }

  test("zorder pruningStats: files partition rows; the box scans a subset") {
    import graft.operators.ZOrderLayout
    val df = (1 to 1000).map(i =>
      (i.toLong, (i % 100).toDouble, (i % 37).toDouble))
      .toDF("id", "a", "b")
    val stats = ZOrderLayout.pruningStats(df, "a", "b", bits = 6,
      nFiles = 16, aLo = 10.0, aHi = 20.0, bLo = 5.0, bHi = 10.0)
      .collect()
    assert(stats.map(_.getLong(1)).sum == 1000L, "rows partition")
    val scanned = stats.filter(_.getBoolean(6))
    assert(scanned.nonEmpty && scanned.length < stats.length,
      s"box must prune some of ${stats.length} files, scanned ${scanned.length}")
    // footer invariants
    stats.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(4) <= r.getDouble(5))
    }
  }
}
