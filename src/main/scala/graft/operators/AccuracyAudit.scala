package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-visible accuracy gate for the approximate operators
  * (SimHash, ANN-LSH, embedding-LSH near-dup, IVF, KMV sketch).
  *
  * Each check recomputes the operator's EXACT twin on the same input and
  * thresholds the recall / error, emitting one (check, pass) row. The
  * mirrored oracle is the constant all-true table, so a recall collapse
  * or band-shift bug flips the row to false and fails the correctness
  * gate as a hash mismatch — the approximate queries stop being
  * row-count-only signals.
  *
  * Thresholds are intentionally below the measured values (see each
  * check) so run-to-run data growth across scale factors doesn't flap,
  * while regressions of the kind that matter (halved recall, unbounded
  * sketch error) trip immediately. Exact twins are O(n²) by nature —
  * this is an audit over the gate corpus, not a production path.
  * `maxAuditRows` bounds the corpus the quadratic twins see: a
  * deterministic lowest-id slice (TakeOrdered — no full sort), the
  * SAME slice on both the exact and approximate side of each check, so
  * recall over the slice is a true paired comparison. At fleet scale
  * pass a bound (e.g. 10⁴-10⁵) and the audit cost stays constant no
  * matter the corpus; the gate default leaves the gate corpora whole.
  * The KMV check is linear and always runs over the full input.
  */
object AccuracyAudit {

  /** Deterministic bounded corpus slice for the quadratic twins. The
    * TakeOrdered funnels everything through one final partition, so it
    * is applied ONLY when the corpus actually exceeds the bound (the
    * count is a cheap column-pruned scan), and the sliced frame is
    * persisted because each audit check references it from several
    * collecting actions. Persisted slices are collected into `cached`
    * so `apply` can unpersist them before returning — the final result
    * is a LocalRelation, so nothing downstream re-reads them. */
  private def slice(df: DataFrame, idCol: String, n: Int,
      cached: scala.collection.mutable.Buffer[DataFrame]): DataFrame =
    if (df.count() <= n) df
    else {
      val s = df.orderBy(col(idCol).asc).limit(n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += s
      s
    }

  /** Stderr stopwatch per check — the audit is a dozen collecting
    * actions; when its wall time moves, this shows which twin moved
    * (the q33/q06 lesson: never diagnose a regression without a
    * per-piece measurement). CAVEAT since the checks run as concurrent
    * job groups: each number is overlapped wall-clock including
    * contention from the other chains, so it localizes a regression to
    * a check but does not isolate its solo cost — for a clean
    * per-check measurement, re-run with the other checks commented out
    * or compare against a single-check bench invocation. */
  private def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    System.err.println(
      f"[audit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def apply(s: SparkSession, dir: String,
      maxAuditRows: Int = 1000000): DataFrame = {
    import s.implicits._
    // The audit's driver-side sets are bounded BY CONTRACT (inputs are
    // sliced to maxAuditRows and a healthy corpus yields far fewer
    // audit pairs than rows); enforce rather than assume — fetch one
    // row past the cap and fail loudly instead of OOMing the driver on
    // a pathologically dense slice. One extra row, no recompute.
    val collectCap = 4 * maxAuditRows
    def boundedSet[T](ds: org.apache.spark.sql.Dataset[T],
        what: String): Set[T] = {
      val rows = ds.limit(collectCap + 1).collect()
      require(rows.length <= collectCap,
        s"audit '$what' exceeded the bounded-collect cap $collectCap — " +
          "the audited slice is pathologically dense; lower maxAuditRows")
      rows.toSet
    }
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    val docs = slice(Tables(s, dir, "documents"), "doc_id", maxAuditRows, cached)
    val emb = slice(Tables(s, dir, "embeddings"), "vec_id", maxAuditRows, cached)
    val events = Tables(s, dir, "events")

    // The six check families are mutually independent chains of
    // collecting actions; run them as concurrent job groups (Spark
    // supports multi-threaded job submission) so the audit's wall time
    // is the LONGEST chain, not the sum — at audit corpus sizes each
    // chain uses a handful of the 32 cores, so overlap is nearly free.
    implicit val ec: ExecutionContext = ExecutionContext.global

    // --- SimHash banding is pigeonhole-exact: hamming <= 3 over 4 bands
    // of 16 bits MUST collide in >= 1 band, so recall is exactly 1.0.
    val fSimhash = Future(timed("simhash_pigeonhole") {
      // ONE fingerprint pass feeds both the exact all-pairs check and
      // the banded operator (simhashFromFingerprints) — the comparison
      // is over identical fps by construction, and the corpus is not
      // re-tokenized twice
      val fps = Dedup.simhashFingerprints(docs, "doc_id", "text")
        .persist()
      val ex = fps.as("a").join(fps.as("b"), col("a.doc") < col("b.doc"))
        .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 3)
        .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .as[(Long, Long)]
      val ls = Dedup.simhashFromFingerprints(fps, bands = 4, maxHamming = 3)
        .select(col("doc_a"), col("doc_b"))
        .as[(Long, Long)]
      val (exSet, lsSet) = (boundedSet(ex, "simhash_exact_pairs"),
        boundedSet(ls, "simhash_banded_pairs"))
      fps.unpersist(blocking = false)
      exSet == lsSet // banding may neither miss nor invent
    })

    // --- ANN: exact top-10 once, both approximate variants against it.
    def ids(df: DataFrame): Set[Long] =
      boundedSet(df.select(col("vec_id")).as[Long], "ann_top_ids")
    val fExactTop = Future(timed("ann_exact_top10")(ids(SimilaritySearch.bruteForceTopK(
      emb, "vec_id", "embedding", queryId = 0L, k = 10))))
    // measured 9/10 at sf0.01 and sf0.1 (true neighbors at cos 0.28-0.41,
    // the random-noise tail); threshold half that
    val fLshTop = Future(timed("ann_lsh_top10")(ids(SimilaritySearch.lshTopK(
      emb, "vec_id", "embedding", queryId = 0L, k = 10, bands = 8192))))
    // IVF probes 2 of 8 cells: geometric recall, measured per TESTDATA
    val fIvfTop = Future(timed("ann_ivf_top10")(ids(SimilaritySearch.ivfTopK(
      emb, "vec_id", "embedding", queryId = 0L, k = 10))))
    val fAnn = for (exactTop <- fExactTop; lshTop <- fLshTop; ivfTop <- fIvfTop)
      yield ((exactTop & lshTop).size >= 5, (exactTop & ivfTop).size >= 4)

    // --- embedding near-dup LSH recall vs the exact O(n²) kernel
    // (measured 1.0 at sf0.01, 0.958 at sf0.1; vacuous-pass if the
    // corpus has no true pairs)
    def pairs(df: DataFrame): Set[(Long, Long)] = boundedSet(
      df.select(col("id_a"), col("id_b")).as[(Long, Long)], "neardup_pairs")
    val fExactPairs = Future(timed("embedding_exact_pairs")(
      pairs(SimilaritySearch.embeddingNearDupExact(
        emb, "vec_id", "embedding", threshold = 0.45))))
    val fLshPairs = Future(timed("embedding_lsh_pairs")(
      pairs(SimilaritySearch.embeddingNearDup(
        emb, "vec_id", "embedding", threshold = 0.45))))
    // --- SemDeDup recall vs the same exact kernel: within-cluster
    // verification misses only boundary-straddling pairs (measured 1.0
    // at sf0.01 and sf0.1 — the synthetic corpus clusters cleanly);
    // gate at 0.6, where a broken assignment or collapsed clustering
    // lands near 1/nClusters. Precision is exact by construction
    // (cosine-verified), so invented pairs also fail.
    val fSemPairs = Future(timed("semantic_dedup_pairs")(
      pairs(SimilaritySearch.semanticNearDup(
        emb, "vec_id", "embedding", threshold = 0.45))))
    val fPairs = for (exactPairs <- fExactPairs; lshPairs <- fLshPairs;
                      semPairs <- fSemPairs) yield {
      val neardupOk = exactPairs.isEmpty ||
        (exactPairs & lshPairs).size.toDouble / exactPairs.size >= 0.8
      val semOk = (semPairs -- exactPairs).isEmpty &&
        (exactPairs.isEmpty ||
          (exactPairs & semPairs).size.toDouble / exactPairs.size >= 0.6)
      (neardupOk, semOk)
    }

    // --- Bloom decontamination vs the exact gram join: no false
    // negatives is a HARD Bloom guarantee (exact-flagged ⊆
    // bloom-flagged, checked as a set), and the false-positive side is
    // bounded — at fpp=0.01 a doc needs many coincidental bit hits to
    // cross the 0.3 containment threshold (measured 0 excess docs at
    // sf0.01/sf0.1; gate allows 2% of the corpus).
    def flagged(df: DataFrame): Set[Long] = boundedSet(
      df.filter(col("contaminated")).select(col("doc_id")).as[Long],
      "decontaminate_flagged")
    val benchB = Sampling.hashSample(docs, "doc_id", rate256 = 26)
    val corpusB = docs.join(benchB.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val fExactFlag = Future(timed("decontaminate_exact")(
      flagged(Decontaminate.overlapReport(
        corpusB, benchB, "doc_id", "text", n = 5, threshold = 0.3))))
    val fBloomFlag = Future(timed("decontaminate_bloom")(
      flagged(Decontaminate.bloomOverlapReport(
        corpusB, benchB, "doc_id", "text", n = 5, threshold = 0.3, fpp = 0.01))))
    val fBloom = for (exactFlag <- fExactFlag; bloomFlag <- fBloomFlag) yield {
      val nCorpus = corpusB.count()
      exactFlag.subsetOf(bloomFlag) &&
        (bloomFlag -- exactFlag).size <= math.max(2L, nCorpus / 50).toInt
    }

    // --- KMV distinct sketch vs exact count-distinct: k=256 keeps the
    // relative error ~1/sqrt(k-2) ≈ 6.3% (1σ); gate at 4σ
    val fKmv = Future {
      val worstErr = timed("kmv_vs_exact_distinct") {
        val exactD = events.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_d"))
        val kmvD = events.groupBy(col("event_type"))
          .agg(graft.expressions.KMVSketch
            .approx_distinct_kmv(col("user_id"), k = 256).as("kmv_d"))
        exactD.join(kmvD, "event_type")
          .select(max(abs(col("kmv_d") - col("exact_d")) /
            col("exact_d").cast("double")))
          .as[Double].collect().head
      }
      worstErr <= 0.25
    }

    // --- Misra–Gries frequent-items sketch vs exact counts, over word
    // BIGRAMS (≈ 900 distinct at gate scale >> k = 64, so the decrement
    // and merge-trim machinery genuinely fires): every tracked item's
    // estimate must sit in [true − N/(k+1), true] and every item above
    // the N/(k+1) support must be tracked. Both hold by theorem for any
    // input — a false means the sketch implementation broke.
    val fMg = Future {
      val bigrams = docs.select(
        explode(graft.expressions.WordNGrams.allGrams(
          graft.functions.TextFns.words(col("text")), 2)).as("g"))
      timed("mg_guarantee")(
        FrequentItems.mgGuaranteeAudit(bigrams, col("g"), k = 64))
    }

    // --- HyperBall registers vs an exact driver-side BFS: the
    // distributed register merge must produce, node for node, EXACTLY
    // the registers computed from the true ≤1-hop ball (the md5
    // derivation is deterministic, so this is set equality, not a
    // tolerance — a wrong merge, a dropped propagation, or a hash
    // divergence all break it; round-to-round monotone behavior is
    // pinned by the hand-derived Round18OpsSpec fixtures, so one round
    // keeps the audit cheap without losing the merge check). The graph
    // is a bounded user→type bipartite slice of events; the
    // independent re-derivation below shares NO code with
    // GraphRank.hyperBall.
    val fHyperball = Future(timed("hyperball_register_exact") {
      // ONE events scan: the collected edge set both seeds the exact
      // BFS and (as a LocalRelation) feeds the operator, so the two
      // sides audit the IDENTICAL graph and the operator's internal
      // rounds run on tiny in-memory frames
      val edgeRows = boundedSet(events
        .filter(col("user_id").isNotNull && col("user_id") < 500)
        .select((col("user_id") * 2L).as("u"),
          (pmod(xxhash64(col("event_type")), lit(64L)) * 2L + 1L).as("v"))
        .distinct().as[(Long, Long)], "hyperball_edges")
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
        .withDefaultValue(Set.empty)
      edgeRows.foreach { case (u, v) =>
        adj(u) = adj(u) + v; adj(v) = adj(v) + u
      }
      def reg(node: Long): (Long, Long) = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(node.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val bucket = java.lang.Long.parseLong(h.substring(0, 1), 16)
        val tail = h.substring(1, 16)
        val trimmed = tail.dropWhile(_ == '0')
        val rho =
          if (trimmed.isEmpty) 61L
          else {
            val z = (tail.length - trimmed.length).toLong
            val d = java.lang.Long.parseLong(trimmed.substring(0, 1), 16)
            z * 4L + (if (d >= 8) 0L else if (d >= 4) 1L
              else if (d >= 2) 2L else 3L) + 1L
          }
        (bucket, rho)
      }
      val expected = adj.keySet.toSeq.map { n =>
        val ball = Set(n) ++ adj(n)
        val regs = ball.toSeq.map(reg).groupBy(_._1)
          .map { case (b, rs) => b -> rs.map(_._2).max }
        (n, regs.size.toLong, regs.values.sum)
      }.toSet
      val got = boundedSet(GraphRank.hyperBall(
        edgeRows.toSeq.toDF("u", "v"), "u", "v", rounds = 1)
        .select(col("node"), col("n_set"), col("sum_rho"))
        .as[(Long, Long, Long)], "hyperball_registers")
      got == expected
    })

    val simhashOk = Await.result(fSimhash, Duration.Inf)
    val (annLshOk, ivfOk) = Await.result(fAnn, Duration.Inf)
    val (neardupOk, semOk) = Await.result(fPairs, Duration.Inf)
    val bloomOk = Await.result(fBloom, Duration.Inf)
    val kmvOk = Await.result(fKmv, Duration.Inf)
    val (mgBoundsOk, mgNoMiss) = Await.result(fMg, Duration.Inf)
    val hyperballOk = Await.result(fHyperball, Duration.Inf)

    // every check above has collected its booleans — the slices are done
    cached.foreach(_.unpersist(blocking = false))

    Seq(
      ("simhash_pigeonhole_exact", simhashOk),
      ("ann_lsh_top10_overlap", annLshOk),
      ("ann_ivf_top10_overlap", ivfOk),
      ("embedding_lsh_recall", neardupOk),
      ("semantic_dedup_recall", semOk),
      ("bloom_decontaminate_superset", bloomOk),
      ("kmv_rel_err_bound", kmvOk),
      ("mg_tracked_bounds", mgBoundsOk),
      ("mg_no_missed_heavy", mgNoMiss),
      ("hyperball_register_exact", hyperballOk)
    ).toDF("check", "pass")
  }
}
