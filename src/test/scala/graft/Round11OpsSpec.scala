package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LineDedup, SimilaritySearch, TextAnalysis}

/** Round-11 operators: line-level cross-doc dedup, prefix-filtered
  * exact Jaccard join, int8-quantized ANN, PQ shortlist+refine ANN,
  * n-gram novelty. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- line-level cross-document dedup ---------------------------------

  private val lineDocs = Seq(
    (0L, "a b c x y z"),
    (1L, "a b c q r s"),
    (2L, "u v w m n o")
  ).toDF("doc_id", "text")

  test("lineDedup drops the cross-doc boilerplate line from every carrier") {
    val out = LineDedup.trimReport(lineDocs, "doc_id", "text",
      lineWords = 3, maxDocFreq = 1L)
    assert(out.rowsSet == Set(
      Seq(0L, 2L, 1L, "x y z"),
      Seq(1L, 2L, 1L, "q r s"),
      Seq(2L, 2L, 2L, "u v w m n o")))
  }

  test("lineDedup keeps within-doc repeats (cross-doc axis only) and " +
    "emits empty-string rows for fully-boilerplate docs") {
    val docs = Seq(
      (0L, "a b c a b c"),  // same line twice WITHIN one doc -> kept
      (1L, "p q r x y z"),
      (2L, "p q r x y z")   // 1 and 2 are full duplicates -> both emptied
    ).toDF("doc_id", "text")
    val out = LineDedup.trimReport(docs, "doc_id", "text",
      lineWords = 3, maxDocFreq = 1L)
    assert(out.rowsSet == Set(
      Seq(0L, 2L, 2L, "a b c a b c"),
      Seq(1L, 2L, 0L, ""),
      Seq(2L, 2L, 0L, "")))
  }

  // ---- prefix-filtered exact Jaccard join ------------------------------

  private val jacDocs = Seq(
    (0L, "w1 w2 w3 w4 w5"),
    (1L, "w1 w2 w3 w4 w6"),  // J(0,1) = 2/4 = 0.5
    (2L, "x1 x2 x3 x4 x5"),
    (3L, "w1 w2 w3 w4 w5")   // exact dup of 0
  ).toDF("doc_id", "text")

  test("prefixFilteredJaccard equals the posting-join jaccardNearDup") {
    val ppjoin = Dedup.prefixFilteredJaccard(jacDocs, "doc_id", "text",
      n = 3, thrNum = 1L, thrDen = 2L)
    val postings = Dedup.jaccardNearDup(jacDocs, "doc_id", "text",
      n = 3, threshold = 0.5)
    assert(ppjoin.rowsSet == postings.rowsSet)
    assert(ppjoin.rowsSet.map(_.take(2)) ==
      Set(Seq(0L, 1L), Seq(0L, 3L), Seq(1L, 3L)))
    graft.Caches.unpersistAll()
  }

  test("prefixFilteredJaccard finds no pairs below threshold") {
    val far = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c x y z")  // inter {abc} over union 7 -> J < 0.5
    ).toDF("doc_id", "text")
    assert(Dedup.prefixFilteredJaccard(far, "doc_id", "text",
      n = 3, thrNum = 1L, thrDen = 2L).count() == 0L)
    graft.Caches.unpersistAll()
  }

  test("shingleStats reports posting volume: df counts and pair sum") {
    // jacDocs: "w1 w2 w3" etc. — docs 0 and 3 identical, doc 1 shares
    // 2 of 3 shingles with them, doc 2 disjoint
    val r = Dedup.shingleStats(jacDocs, "doc_id", "text", n = 3)
      .collect()(0)
    // distinct shingles: 0/3 {123,234,345}, 1 adds {346}, 2 adds 3 -> 7
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 3L)  // "w1 w2 w3" carried by docs 0,1,3
    // pairs: df=3 -> 3, df=3 -> 3 (123 and 234), df=2 -> 1 (345);
    // 345 is docs 0+3 only -> df=2; total 3+3+1 = 7
    assert(r.getLong(2) == 7L)
  }

  // ---- int8 quantization -----------------------------------------------

  test("QuantizeInt8 codes: round(127*x/maxabs), zero vector safe") {
    val df = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val codes = df.select(col("id"),
        graft.expressions.QuantizeInt8(col("v")).as("c"))
      .orderBy("id").collect()
      .map(_.getSeq[Byte](1).toSeq)
    assert(codes(0) == Seq[Byte](64, -127, 32))
    assert(codes(1) == Seq[Byte](0, 0, 0))
  }

  private val annVecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("quantizedTopK reproduces the exact ranking on separated vectors") {
    val exact = SimilaritySearch.bruteForceTopK(annVecs,
      "vec_id", "embedding", 0L, 3).select($"vec_id")
      .collect().map(_.getLong(0)).toSeq
    val quant = SimilaritySearch.quantizedTopK(annVecs,
      "vec_id", "embedding", 0L, 3).select($"vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(quant == exact && exact == Seq(1L, 2L, 3L))
  }

  // ---- PQ shortlist + refine -------------------------------------------

  test("pqTopKRefined with shortlist >= corpus equals the exact top-k") {
    val exact = SimilaritySearch.bruteForceTopK(annVecs,
      "vec_id", "embedding", 0L, 3).rowsSet
    val pq = SimilaritySearch.pqTopKRefined(annVecs,
      "vec_id", "embedding", 0L, 3, m = 2, nCodes = 4, shortlist = 10)
    assert(pq.rowsSet == exact)
  }

  test("PqEncode emits one in-range code per subspace") {
    val idx = SimilaritySearch.pqIndex(annVecs, "vec_id", "embedding",
      m = 2, nCodes = 4)
    val codes = idx.encoded.select(col("codes")).collect()
      .map(_.getSeq[Byte](0).toSeq)
    assert(codes.forall(c => c.length == 2 && c.forall(b => b >= 0 && b < 4)))
    assert(idx.codebooks.length == 2 && idx.subDim == 2)
  }

  // ---- content-defined chunking ----------------------------------------

  private val longDoc = (0 until 60)
    .map(i => s"w${(i * 7919) % 97}").mkString(" ")

  test("contentDefinedChunks tiles the normalized text exactly") {
    val docs = Seq((0L, longDoc), (1L, "tiny"), (2L, "Spaced   Out TEXT"))
      .toDF("doc_id", "text")
    val out = graft.operators.Chunking
      .contentDefinedChunks(docs, "doc_id", "text", k = 8, maskBits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val byDoc = out.groupBy(_._1)
    // spans are contiguous from 1 to len and concat to the normalized text
    for ((doc, norm) <- Seq(0L -> longDoc.toLowerCase, 1L -> "tiny",
        2L -> "spaced out text")) {
      val spans = byDoc(doc).sortBy(_._2)
      assert(spans.head._2 == 1L && spans.last._3 == norm.length.toLong)
      assert(spans.sliding(2).forall {
        case Array(a, b) => b._2 == a._3 + 1; case _ => true })
      assert(spans.map(_._4).mkString == norm)
    }
    // a doc shorter than k is one whole-doc chunk
    assert(byDoc(1L).length == 1)
  }

  test("contentDefinedChunks re-synchronizes after a prefix edit") {
    val docs = Seq((0L, longDoc), (1L, "Z" + longDoc)).toDF("doc_id", "text")
    val out = graft.operators.Chunking
      .contentDefinedChunks(docs, "doc_id", "text", k = 8, maskBits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val a = out.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    val b = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // a one-char prepend shifts every window content by one position, so
    // boundaries shift with it: every chunk except the FIRST is identical
    assert(a.length > 1, s"fixture needs >1 chunk, got ${a.length}")
    assert(a.tail.sameElements(b.tail))
    assert("z" + a.head == b.head)
  }

  // ---- decay activity --------------------------------------------------

  test("decayActivity: exact e6 powers, ref = max day, old events zeroed") {
    val day = 86400L * 1000000000L
    val ev = Seq(
      (1L, 10L * day),       // age 0
      (1L, 9L * day),        // age 1
      (2L, 8L * day),        // age 2
      (2L, -30L * day)       // age 40 -> 0
    ).toDF("user_id", "ts")
    val out = graft.operators.EventAnalytics
      .decayActivity(ev, "user_id", "ts", 4, 5, maxAgeDays = 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1000000L + 800000L)))
    assert(out(2L) == ((2L, 640000L)))
  }

  test("decayPowersE6 is the exact half-up rational table") {
    val p = graft.operators.EventAnalytics.decayPowersE6(4, 5, 3)
    assert(p == Seq(1000000L, 800000L, 640000L, 512000L))
    // half-up on a .5: (1/2)^1 at e1 scale would be 5 -> check via 1/3
    val t = graft.operators.EventAnalytics.decayPowersE6(1, 3, 2)
    assert(t == Seq(1000000L, 333333L, 111111L))
  }

  // ---- split leakage ---------------------------------------------------

  test("splitLeakage keeps only cross-split pairs, labels attached") {
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.8)).toDF("id_a", "id_b", "cosine")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "val"), (4L, "val"))
      .toDF("vec_id", "split")
    val out = graft.operators.Decontaminate
      .splitLeakage(pairs, "id_a", "id_b", splits, "vec_id")
    assert(out.rowsSet == Set(Seq(1L, 2L, 0.9, "train", "test")))
  }

  test("clusterAwareSplit puts every near-dup cluster on ONE side") {
    val ids = (1L to 40L).map(Tuple1(_)).toDF("vec_id")
    // clusters {1,2,3} (chained) and {10,11}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = graft.operators.Sampling.clusterAwareSplit(ids, "vec_id",
        pairs, "id_a", "id_b", Seq(200, 32, 24), Seq("train", "val", "test"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // all cluster members share the min-id rep and therefore the split
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size == 1)
    // singletons represent themselves
    assert(byId(20L)._2 == 20L)
    assert(out.length == 40)
    graft.Caches.unpersistAll()
  }

  // ---- OOV rate --------------------------------------------------------

  test("oovReport counts tokens missing from the vocab") {
    val docs = Seq((0L, "a b a zz"), (1L, "zz qq")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val out = graft.operators.VocabBuild
      .oovReport(docs, "doc_id", "text", vocab)
    assert(out.rowsSet == Set(
      Seq(0L, 4L, 1L, 2500L),
      Seq(1L, 2L, 2L, 10000L)))
  }

  // ---- n-gram novelty --------------------------------------------------

  test("ngramNovelty scores first-carrier grams, zeros gram-less docs") {
    val docs = Seq(
      (0L, "a b c d"),  // grams {abc, bcd}: both first here -> 10000
      (1L, "a b c e"),  // {abc (first in 0), bce} -> 1/2 -> 5000
      (2L, "xy")        // no grams -> zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
    assert(out.rowsSet == Set(
      Seq(0L, 2L, 2L, 10000L),
      Seq(1L, 2L, 1L, 5000L),
      Seq(2L, 0L, 0L, 0L)))
    graft.Caches.unpersistAll()
  }
}
