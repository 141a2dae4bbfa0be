package graft

import graft.operators.{Dedup, Multimodal, Prototypes, Spectral,
  TextAnalysis}

/** Round-14 operator semantics: simplified silhouette over the Lloyd
  * clustering. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  test("simplifiedSilhouette: exact (b-a)/b on squared distances, " +
    "per-cluster means, k=1 degenerates to 0") {
    // 1-dim corpus with two tight groups around 0.0 and 1.0; with
    // k = 2 Lloyd converges to the group means whatever the md5 seed
    // order, so a/b are hand-computable from the final centroids.
    val emb = Seq(
      (0L, Seq(0.0f)), (1L, Seq(0.1f)),
      (2L, Seq(1.0f)), (3L, Seq(1.1f))).toDF("vec_id", "embedding")
    val out = Prototypes.simplifiedSilhouette(
      emb, "vec_id", "embedding", k = 2, iterations = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    // centroids land on 0.05 and 1.05 (e6: 50000, 1050000): every
    // point has a2 = 50000², b2 = 950000² or 1050000²... compute both
    // cluster means exactly the way the operator rounds:
    def sE6(a2: BigInt, b2: BigInt): Long =
      (((b2 - a2) * 2000000 + b2) / (b2 * 2)).toLong
    def mean(ss: Seq[Long]): Long =
      ((BigInt(ss.sum) * 2 + ss.length) / (ss.length * 2)).toLong
    val lo = mean(Seq(
      sE6(BigInt(50000).pow(2), BigInt(1050000).pow(2)),   // x=0.0
      sE6(BigInt(50000).pow(2), BigInt(950000).pow(2))))   // x=0.1
    val hi = mean(Seq(
      sE6(BigInt(50000).pow(2), BigInt(950000).pow(2)),    // x=1.0
      sE6(BigInt(50000).pow(2), BigInt(1050000).pow(2))))  // x=1.1
    assert(out.map(_._1) == Seq(2L, 2L))
    assert(out.map(_._2).toSet == Set(lo, hi))
    // all points deep inside their cluster: s well above 0.9 e6
    assert(out.forall(_._2 > 900000L))
    // k = 1: no "other" cluster, b2 is NULL, s collapses to 0
    val one = Prototypes.simplifiedSilhouette(
      emb, "vec_id", "embedding", k = 1, iterations = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(one == Seq((4L, 0L)))
  }

  test("zipfSlope: exact octave points and e6 OLS on a hand-built " +
    "rank-frequency curve") {
    // freqs a:8 b:4 c:2 d:1 -> ranks 1..4 -> octave points
    // (0,3) (1,2) (1,1) (2,0); OLS: slope -12/8 = -1.5, intercept 3
    val docs = Seq(
      (1L, "g1", ("a " * 8 + "b " * 4 + "c c d").trim),
      // second group: uniform freqs -> flat slope 0 through y=0
      (2L, "g2", "x y z")).toDF("doc_id", "grp", "text")
    val out = TextAnalysis.zipfSlope(docs, "text", "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(out == Seq(
      ("g1", 4L, -1500000L, 3000000L),
      ("g2", 3L, 0L, 0L)))
  }

  test("topPcPower/pcProjection: exact convergence on perfectly " +
    "1-D data") {
    // all four vectors lie on direction (2, 1), mean exactly zero:
    // one power step already lands on the line; max-|.| renorm makes
    // dim1 = 1e6 and dim2 = (1e6+1)//2 = 500000 (exact half-away)
    val emb = Seq(
      (0L, Seq(2.0f, 1.0f)), (1L, Seq(-2.0f, -1.0f)),
      (2L, Seq(4.0f, 2.0f)), (3L, Seq(-4.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val pc = Spectral.topPcPower(emb, "vec_id", "embedding",
      iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(pc == Seq((1L, 1000000L), (2L, 500000L)))
    // projections: round(x·v / 1e6) — (2e6,1e6)·(1e6,5e5) = 2.5e12
    val proj = Spectral.pcProjection(emb, "vec_id", "embedding",
      iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(proj == Seq((0L, 2500000L), (1L, -2500000L),
      (2L, 5000000L), (3L, -5000000L)))
  }

  test("sourceContainment: asymmetric shared-gram shares, " +
    "non-overlapping sources emit no row") {
    // A: grams {a b c, b c d}; B: {a b c, b c x}; C: {z z z} (the
    // doc's repeated gram collapses via per-source distinct)
    val docs = Seq(
      ("A", "a b c d"), ("B", "a b c x"), ("C", "z z z z z"))
      .toDF("source", "text")
    val out = Dedup.sourceContainment(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(out == Seq(("A", "B", 1L, 5000L), ("B", "A", 1L, 5000L)))
  }

  test("silenceTrim: quiet flags, edge runs, all-quiet degenerate") {
    def le32(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
      ((v >> 24) & 255).toByte)
    def le16(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte)
    def wav(samples: Seq[Int]) = "RIFF".getBytes("UTF-8") ++
      le32(36 + samples.length * 2) ++ "WAVE".getBytes("UTF-8") ++
      "fmt ".getBytes("UTF-8") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("UTF-8") ++ le32(samples.length * 2) ++
      samples.toArray.flatMap(le16)
    // frames of 2 at midline 0, thr 1000: quiet/loud/quiet/quiet
    val a = wav(Seq(0, 0, 1000, 1000, 0, 0, 0, 0))
    val b = wav(Seq(0, 0)) // one all-quiet frame
    val out = Multimodal.silenceTrim(
      Seq((1L, a), (2L, b)).toDF("doc_id", "payload"),
      "doc_id", "payload", frameSamples = 2, midline = 0L,
      devThreshold = 1000L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((4L, 3L, 1L, 2L)))
    assert(out(2L) == ((1L, 1L, 1L, 1L)))
  }
}
