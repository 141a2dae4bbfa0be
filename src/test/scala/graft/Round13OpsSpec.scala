package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** Round-13 operator semantics: BPE boundary anchoring and the batched
  * symbol-disjoint trainer. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merge application anchors to symbol boundaries " +
    "(ADVICE r12: 'ca b' must not match merge (a,b))") {
    // freq: ca:3, cab:1, ab:2
    // round 1: pairs (c,a) 3+1=4, (a,b) 1+2=3 -> adopt (c,a)
    //   word 'cab': "c a b" -> "ca b"
    // round 2: pairs (ca,b) 1, (a,b) 2 (only 'ab' contributes — 'cab'
    //   is now "ca b" whose symbol pair is (ca,b)) -> adopt (a,b)
    //   word 'cab' is "ca b" — symbol pair is (ca,b), NOT (a,b): the
    //   old substring replace matched the "a b" INSIDE "ca b" and
    //   produced "cab" (a partial-symbol merge); anchored apply must
    //   leave it segmented
    // round 3: pairs (ca,b) 1 -> adopt (ca,b)
    val docs = Seq((1L, "ca ca ca cab ab ab")).toDF("doc_id", "text")
    val m = BpeTrain.topMerges(docs, "doc_id", "text", rounds = 3)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq(("c", "a", 4L), ("a", "b", 2L), ("ca", "b", 1L)))
    // observable through encode: under 2 rounds, 'cab' must stay 2
    // tokens ("ca b"), so the doc counts 6 words / 3*1 + 2 + 2*1 = 7
    // tokens; the boundary bug yielded 6
    val enc = BpeTrain.encodeTokenCounts(docs, "doc_id", "text", rounds = 2)
      .collect()(0)
    assert(enc.getLong(1) == 6L && enc.getLong(2) == 7L)
  }

  test("batched BPE keeps only pairs symbol-disjoint from every " +
    "higher-ranked candidate, one batch per pass") {
    // vocab: xy:3 ("x y"), yz:2 ("y z"), zw:1 ("z w")
    // pass 1 candidates ranked: (x,y,3), (y,z,2), (z,w,1)
    //   keep (x,y); (y,z) shares y -> skipped (but its symbols still
    //   block lower ranks); (z,w) shares z with the SKIPPED (y,z) ->
    //   skipped too (the rule checks all higher-ranked candidates)
    // pass 2: "xy" done; (y,z,2) kept, (z,w,1) blocked again
    // pass 3: (z,w,1) kept
    val docs = Seq((1L, "xy xy xy yz yz zw")).toDF("doc_id", "text")
    val m = BpeTrain.topMergesBatched(docs, "doc_id", "text",
      passes = 4, batchCap = 16, candN = 256)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(m.toSeq == Seq(
      (1L, 1, "x", "y", "xy", 3L),
      (2L, 2, "y", "z", "yz", 2L),
      (3L, 3, "z", "w", "zw", 1L)))
    // encode under the same model: every word fully merged -> 1 token
    val enc = BpeTrain.encodeTokenCountsBatched(docs, "doc_id", "text",
      passes = 4, batchCap = 16, candN = 256).collect()(0)
    assert(enc.getLong(1) == 6L && enc.getLong(2) == 6L)
    // staged artifact round-trips: the shipped tables equal the
    // direct train (deterministic trainer)
    val store = java.nio.file.Files
      .createTempDirectory("graft-spec-bpe-store").toString
    val (sm, sw) = BpeTrain.stagedBatchedModel(docs, "text", store,
      passes = 4, batchCap = 16, candN = 256)
    assert(sm.orderBy($"merge_rank").collect().map(r =>
      (r.getLong(0), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, "x", "y"), (2L, "y", "z"), (3L, "z", "w")))
    assert(sw.collect().map(r =>
      (r.getAs[String]("w"), r.getAs[String]("syms"))).toMap ==
      Map("xy" -> "xy", "yz" -> "yz", "zw" -> "zw"))
  }

  test("batched BPE applies self-pairs greedily left-to-right") {
    // 'aaaa' x2: pass 1 pair (a,a) cnt 6 (3 adjacencies x freq 2);
    // greedy application merges positions 1-2 and 3-4 -> "aa aa",
    // so pass 2 sees (aa,aa) cnt 2 — an overlapping (wrong) apply
    // would leave "aa a a" or collapse differently
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = BpeTrain.topMergesBatched(docs, "doc_id", "text",
      passes = 2, batchCap = 16, candN = 256)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(5)))
    assert(m.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("batched BPE adopts independent pairs together in one pass") {
    // two disjoint alphabets in one corpus: (p,q) and (u,v) share no
    // symbols, so BOTH adopt in pass 1
    val docs = Seq((1L, "pq pq uv")).toDF("doc_id", "text")
    val m = BpeTrain.topMergesBatched(docs, "doc_id", "text",
      passes = 1, batchCap = 16, candN = 256)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(5)))
    assert(m.toSeq == Seq((1, "p", "q", 2L), (1, "u", "v", 1L)))
  }

  test("bootstrapMeans: membership is the md5(key:rep) rule, means exact") {
    val rows = Seq((1L, 2L), (2L, 4L), (3L, 6L))
    val out = graft.operators.Sampling.bootstrapMeans(
        rows.toDF("id", "v"), "id", "v", reps = 8)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    def member(k: Long, rep: Int): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$k:$rep".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.charAt(0) < '8'
    }
    (0 until 8).foreach { rep =>
      val vs = rows.filter(p => member(p._1, rep)).map(_._2)
      if (vs.isEmpty) assert(!out.contains(rep))
      else {
        val (n, m) = out(rep)
        assert(n == vs.size.toLong)
        // ratioScaled's exact half-up identity
        assert(m == (vs.sum * 2000000L + vs.size) / (2L * vs.size))
      }
    }
    // replicates genuinely differ (the rule depends on rep)
    assert(out.values.map(_._1).toSet.size > 1 ||
      out.keySet.size < 8)
  }

  test("calibrationBins: bins clamp, exact rationals, ECE over rounded gaps") {
    // scores e4; bin width 2500 (4 bins): rows -> bins 0,0,1,3(clamped),3
    val rows = Seq((1000L, false), (2000L, true), (3000L, true),
      (10000L, true), (9000L, false))
    val out = graft.operators.EvalMetrics.calibrationBins(
        rows.toDF("q_e4", "keep"), "q_e4", "keep", bins = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6))).toMap
    // bin 0: n=2, sum_q=3000 -> conf=round(3000*100/2)=150000,
    //        acc=round(1*1e6/2)=500000, gap=350000
    assert(out(0L) == (2L, 1L, 150000L, 500000L, 350000L, out(0L)._6))
    // bin 1: n=1 conf=300000 acc=1000000 gap=700000
    assert(out(1L) == (1L, 1L, 300000L, 1000000L, 700000L, out(1L)._6))
    // bin 3 (10000 clamps in, true score kept in the sum): n=2,
    //        conf=round(19000*100/2)=950000, acc=500000, gap=450000
    assert(out(3L) == (2L, 1L, 950000L, 500000L, 450000L, out(3L)._6))
    // ECE = round((2*350000 + 1*700000 + 2*450000)/5) = 460000
    assert(out.values.map(_._6).toSet == Set(460000L))
  }

  test("epochCappedWaterFill: prefix saturation, residual order, exact sum") {
    // weights 1,2,10,10 E=2 -> caps 2,4,20,20; budget = 23*1 = 23
    // sat check (cap asc): 2*4=8<=23 sat; 4*3+2=14<=23 sat;
    //   20*2+6=46>23 not. k=2, rem=23-6=17, m=2, base=8, res=1
    // allocs: a=2, b=4, big1=9 (first non-sat gets +1), big2=8
    val rows = Seq(("a", 1L), ("b", 2L), ("c", 10L), ("d", 10L))
    val out = graft.operators.Apportion.epochCappedWaterFill(
        rows.toDF("source", "w"), "source", "w",
        budgetNum = 1L, budgetDen = 1L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(out("a") == (2L, true, 2L))
    assert(out("b") == (4L, true, 4L))
    assert(out("c") == (20L, false, 9L))
    assert(out("d") == (20L, false, 8L))
    assert(out.values.map(_._3).sum == 23L)
    // budget >= total caps: everything saturates at cap
    val sat = graft.operators.Apportion.epochCappedWaterFill(
        rows.toDF("source", "w"), "source", "w",
        budgetNum = 5L, budgetDen = 1L, maxEpochs = 2L)
      .collect().map(r => (r.getBoolean(3), r.getLong(2) == r.getLong(4)))
    assert(sat.forall { case (s, capEq) => s && capEq })
  }

  test("targetLikeness: smoothed unigram ratio, exact on a hand corpus") {
    // TextFns.words('') is [''] (string_split mirrors), so doc3
    // contributes one empty-string token to the corpus counts:
    // tokens: doc1 (target) a,b; doc2 a; doc3 ''
    // wc: a cc=2 ct=1; b cc=1 ct=1; '' cc=1 ct=0; Cc=4 Ct=2 V=3
    // r(a)  = (1+1)(4+3)/((2+3)(2+1)) = 14/15 -> 933333
    // r(b)  = 14/((5)(1+1))           = 14/10 -> 1400000
    // r('') = (0+1)(7)/((5)(1+1))     = 7/10  -> 700000
    val docs = Seq((1L, "a b", "en"), (2L, "a", "de"), (3L, "", "de"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.ImportanceScore.targetLikeness(
        docs, "doc_id", "text", $"lang" === "en")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (2L, 2333333L, 1166667L))
    assert(out(2L) == (1L, 933333L, 933333L))
    assert(out(3L) == (1L, 700000L, 700000L))
  }

  test("cohenKappa: exact chance-corrected agreement on a hand table") {
    // 2x2 table: TT x3, TF x1, FT x2, FF x4 -> n=10, na=4, nb=5,
    // nab=3, agree=7, po=0.7, E=4*5+6*5=50, pe=0.5,
    // kappa=(70-50)/(100-50)=0.4
    val rows = (Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("a", "b")
    val r = graft.operators.EvalMetrics.cohenKappa(rows, "a", "b")
      .collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 4L &&
      r.getLong(2) == 5L && r.getLong(3) == 3L && r.getLong(4) == 7L)
    assert(r.getLong(5) == 700000L && r.getLong(6) == 500000L &&
      r.getLong(7) == 400000L)
    // constant raters: chance term saturates -> kappa pinned to 0
    val const = Seq.fill(5)((true, true)).toDF("a", "b")
    assert(graft.operators.EvalMetrics.cohenKappa(const, "a", "b")
      .collect()(0).getLong(7) == 0L)
    // perfect disagreement on balanced marginals -> kappa -1
    val anti = (Seq.fill(5)((true, false)) ++ Seq.fill(5)((false, true)))
      .toDF("a", "b")
    assert(graft.operators.EvalMetrics.cohenKappa(anti, "a", "b")
      .collect()(0).getLong(7) == -1000000L)
  }

  test("torn-batch recovery: idempotent sink replays batch once, " +
    "a plain append sink duplicates it (q199's failure harness is real)") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    def scenario(idempotent: Boolean): Seq[(String, Long)] = {
      val root = Files.createTempDirectory("graft_torn").toString
      val (src, sink, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
      new java.io.File(src).mkdirs()
      val schema = StructType(Seq(StructField("k", StringType),
        StructField("v", LongType)))
      def drop(name: String, rows: Seq[(String, Long)], mtime: Long): Unit = {
        val tmp = s"$root/tmp-$name"
        rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dst = new java.io.File(s"$src/$name")
        assert(f.renameTo(dst)); dst.setLastModified(mtime)
      }
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
        val writer =
          if (idempotent) graft.streaming.Streams
            .idempotentAppendSink(stream, sink)
          else stream.writeStream.outputMode("append")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.mode("append").parquet(sink); ()
            }
        graft.streaming.Streams.runAvailableNow(writer, ckpt)
          .awaitTermination()
      }
      val base = System.currentTimeMillis() - 60000L
      drop("f0.parquet", Seq(("a", 1L)), base)
      drop("f1.parquet", Seq(("b", 2L)), base + 2000)
      runOnce()
      // tear batch 1: offsets kept, commit record deleted (through the
      // Hadoop fs so the ChecksumFileSystem's .crc sidecar goes too)
      val fs = new org.apache.hadoop.fs.Path(ckpt)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/1"),
        false))
      drop("f2.parquet", Seq(("c", 3L)), base + 4000)
      runOnce()
      spark.read.parquet(sink).select("k", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    }
    // idempotent: batch 1 replays into its own partition -> no dupes
    assert(scenario(idempotent = true) ==
      Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    // plain append: the replayed batch appends a second copy of "b" -
    // proving the harness genuinely re-runs the torn batch
    assert(scenario(idempotent = false) ==
      Seq(("a", 1L), ("b", 2L), ("b", 2L), ("c", 3L)))
  }

  test("lexicalDiversity: exact Gini–Simpson, hapax, top-k mass " +
    "on a hand corpus") {
    // source s1: docs "a a b" + "a" -> counts a:3 b:1; C=4 V=2
    //   gini = (16-10)/16 = 0.375 -> 375000; ttr = 2/4 -> 500000
    //   hapax = 1/2 -> 500000; top1 (a,3) mass = 3/4 -> 750000
    // source s2: one blank doc -> words('') = ['']: C=1 V=1
    //   gini = (1-1)/1 = 0; ttr = hapax = top1 mass = 1000000
    val docs = Seq((1L, "a a b", "s1"), (2L, "a", "s1"), (3L, "", "s2"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.LexicalDiversity.perSource(
        docs, "doc_id", "text", "source", topK = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("s1") ==
      (2L, 4L, 2L, 500000L, 375000L, 500000L, 750000L))
    assert(out("s2") ==
      (1L, 1L, 1L, 1000000L, 0L, 1000000L, 1000000L))
  }

  test("bpeFertility: tokens-per-word off the trained word table, " +
    "blank groups emit zero ratios") {
    // corpus "ab ab b": 1 round adopts (a,b); word table: ab->"ab"
    //   (1 tok), b->"b" (1 tok)
    // group g1 = doc1 "ab ab b": 3 words, 3 toks, 5 chars
    //   fertility = 1.0 -> 1000000; chars/tok = 5/3 -> 1666667
    // group g2 = doc2 "": zero words after the length filter
    val docs = Seq((1L, "ab ab b", "g1"), (2L, "", "g2"))
      .toDF("doc_id", "text", "g")
    val model = BpeTrain.encodeTokenCounts(docs, "doc_id", "text",
      rounds = 1) // just to exercise train; word table via topMerges path
    assert(model.count() == 2L)
    val encoded = {
      // reuse the sequential trainer's word table through the public
      // staged surface: train once, read the words DataFrame
      val dirTmp = java.nio.file.Files
        .createTempDirectory("bpe-fert").toString
      val (_, words) = BpeTrain.stagedBatchedModel(docs, "text",
        dirTmp, passes = 1, batchCap = 16, candN = 16)
      words
    }
    val out = graft.operators.BpeTrain.fertilityByGroup(
        docs, "doc_id", "text", "g", encoded)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out("g1") == (1L, 3L, 3L, 5L, 1000000L, 1666667L))
    assert(out("g2") == (1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("lexicalTvMatrix: inner-join identity equals the full TV sum, " +
    "disjoint vocabularies read exactly 1e6") {
    // s1 "a a b": p=(a 2/3, b 1/3); s2 "a c": p=(a 1/2, c 1/2)
    //   TV = (|2/3-1/2| + 1/3 + 1/2)/2 = 1/2 -> 500000
    //   identity: crs=|2*2-1*3|=1, num=1+(3-2)*2+(2-1)*3=6, den=12
    // s3 "d" shares nothing with either -> tv exactly 1000000
    val docs = Seq((1L, "a a b", "s1"), (2L, "a c", "s2"),
      (3L, "d", "s3")).toDF("doc_id", "text", "source")
    val out = graft.operators.Drift.lexicalTvMatrix(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("s1", "s2")) == (2L, 2L, 1L, 500000L))
    assert(out(("s1", "s3")) == (2L, 1L, 0L, 1000000L))
    assert(out(("s2", "s3")) == (2L, 1L, 0L, 1000000L))
  }

  test("interleaveOrder: low-discrepancy positions, prefix holds the " +
    "mix, scalable-rank path") {
    // sources: A has 4 docs, B has 2 -> A at 1/8,3/8,5/8,7/8;
    // B at 1/4,3/4. Sorted by pos: A,B,A,A,B,A — every prefix of the
    // order is within one doc of the 2:1 mix
    val docs = (1L to 4L).map(i => (i, "A")) ++ Seq((5L, "B"), (6L, "B"))
    val out = graft.operators.Apportion.interleaveOrder(
        docs.toDF("doc_id", "source"), "doc_id", "source")
      .collect()
    val pos = out.map(r => (r.getString(1), r.getLong(2)) -> r.getLong(4)).toMap
    assert(pos(("A", 1L)) == 125000000000L &&
      pos(("A", 4L)) == 875000000000L)
    assert(pos(("B", 1L)) == 250000000000L &&
      pos(("B", 2L)) == 750000000000L)
    // within a source, rank follows (md5(id), id) — all ranks distinct
    assert(out.filter(_.getString(1) == "A").map(_.getLong(2)).sorted
      .sameElements(Array(1L, 2L, 3L, 4L)))
    val ordered = out.sortBy(r => (r.getLong(4), r.getString(1)))
      .map(_.getString(1)).toSeq
    assert(ordered == Seq("A", "B", "A", "A", "B", "A"))
  }

  test("interleaveShardMix: slices hold the global mix, exact shares") {
    // 8 docs of A, 4 of B, 2 shards: each shard gets 4 A + 2 B
    // (positions (2r-1)/16 for A, (2r-1)/8 for B; first half of each
    // source's ranks lands in shard 0) -> share 666667/333333 in both
    // shards; dev_e6 = 0/1 (rounding of 2/3 vs 1/3 is exact-stable)
    val docs = ((1L to 8L).map(i => (i, "A")) ++
      (9L to 12L).map(i => (i, "B"))).toDF("doc_id", "source")
    val out = graft.operators.Apportion.interleaveShardMix(
        docs, "doc_id", "source", shards = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (sh <- Seq(0L, 1L)) {
      assert(out((sh, "A")) == (4L, 666667L, 666667L, 0L))
      assert(out((sh, "B")) == (2L, 333333L, 333333L, 0L))
    }
  }

  test("waterFillEpochPlan: saturated groups read maxEpochs full " +
    "passes, partial fraction exact") {
    // weights a:10 b:30; E=2 caps 20/60; budget = 5/4 of 40 = 50
    //   a saturates (20*2 + 0 = 40 <= 50); b takes 50-20 = 30
    //   a: 2 full epochs; b: alloc 30 of 30 -> 1 full epoch, frac 0
    val df = Seq(("a", 10L), ("b", 30L)).toDF("g", "w")
    val out = graft.operators.Apportion.waterFillEpochPlan(
        df, "g", "w", budgetNum = 5L, budgetDen = 4L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(out("a") == (20L, true, 2L, 0L, 0L))
    assert(out("b") == (30L, false, 1L, 0L, 0L))
    // a non-even split: budget 7/8 of 40 = 35; nobody saturates
    // (a: 20*2+0=40 > 35); equal split 17 each, residual 1 -> a 18
    //   a: alloc 18 of 10 -> 1 full + 8/10 -> frac 800000
    //   b: alloc 17 of 30 -> 0 full + 17/30 -> 566667
    val out2 = graft.operators.Apportion.waterFillEpochPlan(
        df, "g", "w", budgetNum = 7L, budgetDen = 8L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out2("a") == (18L, 1L, 8L, 800000L))
    assert(out2("b") == (17L, 0L, 17L, 566667L))
  }

  test("centroidSimilarity: signed cos^2 exact on orthogonal, " +
    "anti-parallel and 45-degree centroids") {
    // centroids (e6): L0 (1e6,0) from two copies; L1 (0,1e6);
    // L2 (-1e6,0); L3 (1e6,1e6)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(-1.0f, 0.0f), 2),
      (5L, Array(1.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Prototypes.centroidSimilarity(
        emb, "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((0L, 1L)) == (2L, 1L, 0L))          // orthogonal
    assert(out((0L, 2L)) == (2L, 1L, -1000000L))   // anti-parallel
    assert(out((0L, 3L)) == (2L, 1L, 500000L))     // cos^2 = 1/2
    assert(out((1L, 2L)) == (1L, 1L, 0L))
    assert(out.size == 6)
  }

  test("rocAuc: tie-corrected Mann-Whitney exact on hand pairs; " +
    "degenerate single-class emits zeros") {
    // pos scores {3,2}, neg {1,2}: wins 3 of 4 pairs, one tie ->
    // AUC = 3.5/4 = 0.875, Gini = 0.75
    val df = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("s", "y")
    val r = graft.operators.EvalMetrics.rocAuc(df, "s", "y")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 2L, 3L))
    assert(r.getLong(3) == 875000L)
    assert(r.getLong(4) == 750000L)
    // a perfect ranker and a perfectly wrong one
    val perfect = Seq((5L, true), (4L, true), (1L, false))
      .toDF("s", "y")
    val p = graft.operators.EvalMetrics.rocAuc(perfect, "s", "y")
      .collect().head
    assert(p.getLong(3) == 1000000L && p.getLong(4) == 1000000L)
    val inverted = Seq((1L, true), (5L, false)).toDF("s", "y")
    val i = graft.operators.EvalMetrics.rocAuc(inverted, "s", "y")
      .collect().head
    assert(i.getLong(3) == 0L && i.getLong(4) == -1000000L)
    // degenerate: no negatives -> zero-denominator convention
    val onlyPos = Seq((1L, true), (2L, true)).toDF("s", "y")
    val o = graft.operators.EvalMetrics.rocAuc(onlyPos, "s", "y")
      .collect().head
    assert(o.getLong(3) == 0L && o.getLong(4) == 0L)
  }

  test("simhashFromFingerprintsCapped: dense buckets drop, sparse " +
    "pairs survive, uncapped path keeps everything") {
    import graft.operators.Dedup
    // 20 identical fingerprints (every band bucket size 20) + one
    // isolated pair in its own buckets
    val fps = ((0L until 20L).map(i => (i, 0L)) ++
      Seq((100L, 5L), (101L, 5L))).toDF("doc", "fp")
    val capped = Dedup.simhashFromFingerprintsCapped(fps, bands = 4,
      maxHamming = 3, maxBucket = 16L).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((100L, 101L, 0L)))
    // uncapped: 190 zero-zero pairs + the (100,101) pair + 40
    // cross pairs (0 vs 5 is hamming 2, sharing the dense key-0
    // buckets) — the capped path sacrifices exactly those cross
    // pairs, the documented recall trade
    val uncapped = Dedup.simhashFromFingerprints(fps, bands = 4,
      maxHamming = 3).count()
    assert(uncapped == 190L + 1L + 40L)
  }

  test("streamingCusum: day-ordered feed reproduces the batch " +
    "recursion; sentinel closes the final day; straddled day " +
    "accumulates across batches") {
    import graft.streaming.Streams
    val root = java.nio.file.Files
      .createTempDirectory("graft_cusum_stream")
    val src = s"$root/feed"
    new java.io.File(src).mkdirs()
    // counts by day: 1,1,1,100, k=26 (the cusumDaily fixture); day 3
    // STRADDLES batches 1 and 2; sentinel day 4 ships last
    def rows(day: Long, n: Int, b: Int) = Seq.fill(n)(("a", day, b))
    Streams.stageBatchFiles(
      (rows(0L, 1, 0) ++ rows(1L, 1, 0) ++ rows(2L, 1, 1) ++
        rows(3L, 40, 1) ++ rows(3L, 60, 2) ++ rows(4L, 1, 2))
        .toDF("group", "day", "b"), "b", src)
    val stream = spark.readStream
      .schema("group STRING, day LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .as[Streams.DayEvent]
    val out = s"$root/out"
    val q = Streams.streamingCusum(stream, Map("a" -> 26L), hMult = 2L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == Map(
      0L -> (1L, 0L, false), 1L -> (1L, 0L, false),
      2L -> (1L, 0L, false), 3L -> (100L, 74L, true)))
  }

  test("streamingThrottle: state advances on dropped events too; a " +
    "gap straddling micro-batches rides in state") {
    import graft.streaming.Streams
    val root = java.nio.file.Files
      .createTempDirectory("graft_throttle_stream")
    val src = s"$root/feed"
    new java.io.File(src).mkdirs()
    val ns = 1000000000L
    // key a: ts 0 (keep), 30 (drop), 95 (95-30=65>60 keep) with the
    // 95 event in batch 2 — the 30 ride must persist; 150 (55, drop).
    // key b: 0 (keep), 61 (keep, exactly >60)
    Streams.stageBatchFiles(Seq(
      ("a", 0L * ns, 1L, 0), ("a", 30L * ns, 2L, 0),
      ("b", 0L * ns, 5L, 0),
      ("a", 95L * ns, 3L, 1), ("b", 61L * ns, 6L, 1),
      ("a", 150L * ns, 4L, 1)
    ).toDF("key", "tsNanos", "eventId", "b"), "b", src)
    val stream = spark.readStream
      .schema("key STRING, tsNanos LONG, eventId LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .as[Streams.SpacedEvent]
    val out = s"$root/out"
    val q = Streams.streamingThrottle(stream, minGapSeconds = 60L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.read.parquet(out)
      .collect().map(_.getAs[Long]("eventId")).toSet
    assert(kept == Set(1L, 3L, 5L, 6L))
  }

  test("embargoSplit: relative edges, per-split counts, and the " +
    "train-entity overlap audit on a hand timeline") {
    val day = 86400L * 1000000000L
    val ev = ((1 to 20).map(d => ("A", d * day)) ++
      Seq(("B", 1 * day), ("B", 20 * day)))
      .toDF("user_id", "ts")
    val out = graft.operators.Sampling
      .embargoSplit(ev, "ts", "user_id", testDays = 7L,
        embargoDays = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out("train") == (11L, 2L, 2L, 1L, 10L))
    assert(out("embargo") == (3L, 1L, 1L, 11L, 13L))
    assert(out("test") == (8L, 2L, 2L, 14L, 20L))
  }

  test("triangleStats: 4-clique + pendant exact; duplicate and " +
    "reversed edges normalize") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 1L)).toDF("a", "b")
    val out = graft.operators.GraphRank.triangleStats(edges, "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (4L, 3L, 500000L))
    assert(out(2L) == (3L, 3L, 1000000L))
    assert(out(3L) == (3L, 3L, 1000000L))
    assert(out(4L) == (3L, 3L, 1000000L))
    assert(out(5L) == (1L, 0L, 0L))
    // total triangle incidence = 3 * (number of triangles) = 12
    assert(out.values.map(_._2).sum == 12L)
  }

  test("cusumDaily: prefix form equals the max(0, S+x-k) recursion " +
    "on a hand series; alarm fires past hMult*k") {
    val day = 86400L * 1000000000L
    // counts by day: 1,1,1,100 -> k = ceil(103/4) = 26
    // S: max-recursion gives (0,0,0,74); alarm at hMult=2 -> 74 > 52
    val rows = Seq.tabulate(1)(_ => (0L, 1)) ++ Seq((1L, 1), (2L, 1)) ++
      Seq.fill(100)((3L, 1))
    val ev = (rows.zipWithIndex.map { case ((d, _), i) =>
      ("a", d * day + i) }).toDF("event_type", "ts")
    val out = graft.operators.EventAnalytics
      .cusumDaily(ev, "event_type", "ts", hMult = 2L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(out(0L) == (1L, 26L, 0L, false))
    assert(out(1L) == (1L, 26L, 0L, false))
    assert(out(2L) == (1L, 26L, 0L, false))
    assert(out(3L) == (100L, 26L, 74L, true))
  }

  test("reweightToAllocation: weights and shares exact on a hand mix") {
    // sources a:8, b:2, c:1 docs; budget 3/4 -> 8; epoch cap 3:
    // caps (24,6,3), none saturates, base 2 + residual 2 by cap order
    // -> alloc c=3, b=3, a=2
    val docs = (Seq.fill(8)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .toDF("source")
    val out = graft.operators.Apportion
      .reweightToAllocation(docs, "source", 3L, 4L, 3L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out("a") == (8L, 2L, 250000L, 727273L, 250000L))
    assert(out("b") == (2L, 3L, 1500000L, 181818L, 375000L))
    assert(out("c") == (1L, 3L, 3000000L, 90909L, 375000L))
  }

  test("vocabGrowth: nested md5-prefix levels give a monotone curve " +
    "matching a hand recomputation") {
    val ids = (0L until 10L).toSeq
    def lvl(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      if (hex < "20") 0 else if (hex < "40") 1
      else if (hex < "80") 2 else 3
    }
    val docs = ids.map(i => (i, s"t$i common")).toDF("doc_id", "text")
    val out = graft.operators.VocabBuild
      .vocabGrowth(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 4)
    (0 to 3).foreach { l =>
      val in = ids.filter(i => lvl(i) <= l)
      val vocab = in.flatMap(i => Seq(s"t$i", "common")).distinct.size
      assert(out(l.toLong) == (in.size.toLong, 2L * in.size, vocab.toLong),
        s"level $l")
    }
    // monotone and the full level covers everything
    assert(out(3L) == (10L, 20L, 11L))
  }

  test("readabilityBySource: FK rational exact on a hand sentence; " +
    "terminator-free text floors at one sentence") {
    // "Hello world. It is done!": w=5, s=2 runs, y=7 vowel runs ->
    // (39*25 + 1180*7*2 - 1559*2*5) / (100*2*5) = 1905/1000 -> 1905000
    val df = Seq(("Hello world. It is done!", "a"), ("bcd", "b"))
      .toDF("text", "source")
    val out = graft.operators.TextAnalysis
      .readabilityBySource(df, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == (1L, 1905000L, 1905000L, 1905000L))
    // "bcd": w=1, s=1 (floored), y=0 ->
    // (39 + 0 - 1559) / 100 = -15.2 -> -15200000
    assert(out("b") == (1L, -15200000L, -15200000L, -15200000L))
  }

  test("canonicalUrl: case/port/www/fragment/tracking/slash variants " +
    "collapse; non-default schemes keep their port") {
    import graft.functions.UrlCanon
    val in = Seq(
      "HTTPS://WWW.Ex.COM:443/A/B/?utm_source=x&b=2&a=1#frag",
      "http://ex.com:80/",
      "ftp://Ex.com:443/x",
      "https://ex.com/x?ref=home&fbclid=1&gclid=2&utm_a=b",
      "https://ex.com/x?id=3").toDF("url")
    val out = in.select(UrlCanon.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://ex.com/A/B?a=1&b=2")
    assert(out(1) == "http://ex.com")
    assert(out(2) == "ftp://ex.com:443/x")
    assert(out(3) == "https://ex.com/x")
    assert(out(4) == "https://ex.com/x?id=3")
    // the three synth variants of one article collapse to one link
    val synth = Seq(0L, 1L, 2L).toDF("doc_id")
      .select(UrlCanon.canonicalUrl(
        UrlCanon.synthUrl(col("doc_id"))).as("c"))
      .distinct().collect().map(_.getString(0))
    assert(synth.toSeq == Seq("https://src0.com/News/Item-0?id=0"))
  }

  test("dhashFingerprints: monotone gradients pin the fp; variant " +
    "groups are banded-hamming near-dups") {
    import graft.operators.{Multimodal, Dedup}
    // 9x8 grayscale gradients: strictly decreasing in x sets every
    // gray(x) > gray(x+1) bit (fp = -1L); increasing sets none
    def grad(desc: Boolean): Array[Int] = Array.tabulate(72) { i =>
      val v = if (desc) 255 - 20 * (i % 9) else 20 * (i % 9)
      (v << 16) | (v << 8) | v
    }
    val png = Seq(
      (1L, Multimodal.encodePng(9, 8, grad(desc = true))),
      (2L, Multimodal.encodePng(9, 8, grad(desc = false))))
      .toDF("doc_id", "payload")
    val fps = Multimodal.dhashFingerprints(png, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == -1L && fps(2L) == 0L)
    // one variant group (ids 0..3 share base 0, one perturbed source
    // pixel): all 6 pairs surface via shared bands with hamming <= 3
    val ids = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val pairs = Dedup.simhashFromFingerprints(
      Multimodal.dhashFingerprints(
        Multimodal.synthVariantPngPayloads(ids, "doc_id", 4),
        "doc_id", "payload"), bands = 4, maxHamming = 3)
      .collect()
    assert(pairs.length == 6)
    assert(pairs.forall(_.getLong(2) <= 3L))
  }

  test("multimodal: ImageIO decode handles truncated PNG bytes " +
    "as recognized-but-undecodable") {
    val id = 7L
    val (w, h) = graft.operators.Multimodal.synthDims(id)
    val rgb = Array.fill(w * h)(0x102030)
    val png = graft.operators.Multimodal.encodePng(w, h, rgb)
    val truncated = png.take(png.length / 2)
    val (fmt, pw, ph, sum, mn, mx) =
      graft.operators.Multimodal.decodeImagePixels(truncated)
    // header parse still tags it a PNG; the codec either fails (null
    // stats — the corrupt-path contract) or, if this JDK's reader
    // tolerates the truncation, reports the true dims; no exception
    // escapes either way
    assert(fmt == "png")
    if (sum.isDefined) assert(pw.contains(w) && ph.contains(h))
    else assert(mn.isEmpty && mx.isEmpty)
  }

  test("dupSpanCoverage: union-of-intervals exact — overlapping " +
    "within-doc repeats, disjoint cross-doc spans, short docs zero") {
    // k=3. dup grams: "a b c" (docs 1+2), "d e f" (docs 1+2),
    // "z z z" (doc 3, positions 0 AND 1 — a within-doc repeat whose
    // intervals [0,3)+[1,4) overlap: union is 4, not 6)
    val docs = Seq(
      (1L, "a b c d e f"),      // spans [0,3)+[3,6) -> 6/6 covered
      (2L, "a b c x d e f"),    // spans [0,3)+[4,7) -> 6/7 covered
      (3L, "z z z z"),          // spans [0,3)+[1,4) -> 4/4 covered
      (4L, "q r")               // < k tokens -> all zeros
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .dupSpanCoverage(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 6L, 2L, 6L, 10000L),
      (2L, 7L, 2L, 6L, 8571L),   // round-half-up(6/7 * 1e4)
      (3L, 4L, 2L, 4L, 10000L),
      (4L, 2L, 0L, 0L, 0L)))
  }

  test("liftTable: exact decile cut, lift over base rate, gain curve; " +
    "score ties broken by id so bucket edges cannot flap") {
    // 6 rows, 3 buckets of 2; positives at ids 1, 2, 4; ids 3 and 4
    // tie on score across the bucket-1 boundary -> id asc decides
    val rows = Seq(
      (1L, 60L, 1), (2L, 50L, 1), (3L, 40L, 0),
      (4L, 40L, 1), (5L, 20L, 0), (6L, 10L, 0)
    ).toDF("id", "score", "y")
    val out = graft.operators.EvalMetrics
      .liftTable(rows, "id", "score", "y", buckets = 3)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // bucket, n_rows, n_pos, rate_e6, lift_e6, cum_gain_e6
      (0L, 2L, 2L, 1000000L, 2000000L, 666667L),
      (1L, 2L, 1L, 500000L, 1000000L, 1000000L),
      (2L, 2L, 0L, 0L, 0L, 1000000L)))
  }

  test("kmeansLloyd: two well-separated pairs converge to their exact " +
    "means from ANY md5 seeding within 3 iterations; inertia exact") {
    // clusters A {(0,0),(0,2)} and B {(10,10),(10,12)}: means (0,1)
    // and (10,11); per-cluster inertia 2·(1e6)² = 2e12 -> e6 2000000.
    // 3 Lloyd iterations reach the stable partition even when both
    // seeds land inside one cluster, so the assertion is seeding-free.
    val emb = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 2f)),
      (3L, Seq(10f, 10f)), (4L, Seq(10f, 12f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Prototypes
      .kmeansLloyd(emb, "vec_id", "embedding", k = 2, iterations = 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      // (dim, ce6, n_members, inertia_e6) — cluster index is
      // seed-order-dependent, the geometry is not
      (1L, 0L, 2L, 2000000L), (2L, 1000000L, 2L, 2000000L),
      (1L, 10000000L, 2L, 2000000L), (2L, 11000000L, 2L, 2000000L)))
  }

  test("benfordCard: ladder digit extraction exact across magnitudes; " +
    "null/zero/negative rows excluded; gaps vs the pinned table") {
    val vals = Seq(Some(1L), Some(23L), Some(456L), Some(7890L),
      Some(12345L), None, Some(0L), Some(-5L)).toDF("v")
    val out = graft.operators.Profile.benfordCard(vals, $"v")
      .orderBy($"digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // digits of 1, 23, 456, 7890, 12345 -> 1,2,4,7,1 over total 5
    assert(out.toSeq == Seq(
      (1L, 2L, 400000L, 98970L), (2L, 1L, 200000L, 23909L),
      (3L, 0L, 0L, 124939L), (4L, 1L, 200000L, 103090L),
      (5L, 0L, 0L, 79181L), (6L, 0L, 0L, 66947L),
      (7L, 1L, 200000L, 142008L), (8L, 0L, 0L, 51153L),
      (9L, 0L, 0L, 45757L)))
  }

  test("removeDupSpans: first occurrence survives, copies delete, " +
    "reconstruction fingerprint pins the kept bytes") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // k=3: "a b c" in docs 1,2,3 (keeper doc1@0), "d e f" in docs
    // 1,2 (keeper doc1@3). Doc 2 keeps only its middle "x"; doc 3 is
    // a full duplicate and keeps nothing; doc 4 is too short for any
    // gram and passes through untouched.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c x d e f"),
      (3L, "a b c"), (4L, "q r")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .removeDupSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 0L, md5hex("a b c d e f")),
      (2L, 7L, 6L, md5hex("x")),
      (3L, 3L, 3L, md5hex("")),
      (4L, 2L, 0L, md5hex("q r"))))
  }

  test("scrubBenchSpans: EVERY bench-gram occurrence removes (no " +
    "keeper); non-bench corpus duplicates survive") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x a b c y"),        // one hit mid-doc -> keeps "x y"
      (11L, "p q r"),            // clean -> untouched
      (12L, "a b c z a b c"),    // two hits -> keeps only "z"
      (13L, "p q r")             // duplicates 11 but NOT in bench ->
    ).toDF("doc_id", "text")     //   span dedup is not this op's job
    val out = graft.operators.Dedup
      .scrubBenchSpans(corpus, bench, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10L, 5L, 3L, md5hex("x y")),
      (11L, 3L, 0L, md5hex("p q r")),
      (12L, 7L, 6L, md5hex("z")),
      (13L, 3L, 0L, md5hex("p q r"))))
  }

  test("cubeStats: all four grouping sets, indicators tell the " +
    "lanes apart, exact sums") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L))
      .toDF("s", "l", "u")
    val out = graft.operators.Profile.cubeStats(df, Seq("s", "l"), $"u")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == Set(
      (Some("a"), Some("x"), 0L, 0L, 1L, 1L),
      (Some("a"), Some("y"), 0L, 0L, 1L, 2L),
      (Some("b"), Some("x"), 0L, 0L, 1L, 4L),
      (Some("a"), None, 0L, 1L, 2L, 3L),
      (Some("b"), None, 0L, 1L, 1L, 4L),
      (None, Some("x"), 1L, 0L, 2L, 5L),   // the cross marginal
      (None, Some("y"), 1L, 0L, 1L, 2L),   // rollup cannot produce
      (None, None, 1L, 1L, 3L, 7L)))
  }

  test("frameZcr: sign changes counted frame-locally, boundary " +
    "transition excluded, deviation exact") {
    def le32(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte,
      ((v >> 24) & 255).toByte)
    def le16(v: Int) = Array[Byte]((v & 255).toByte,
      ((v >> 8) & 255).toByte)
    val samples = Seq(100, -50, 30, -10, 5, 5, -5, 8,
      1, 2, 3, 4, -4, -3, -2, -1)
    val hdr = "RIFF".getBytes("UTF-8") ++ le32(68) ++
      "WAVE".getBytes("UTF-8") ++ "fmt ".getBytes("UTF-8") ++
      le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ "data".getBytes("UTF-8") ++ le32(32)
    val payload = hdr ++ samples.flatMap(le16)
    val out = graft.operators.Multimodal.frameZcr(
      Seq((1L, payload)).toDF("doc_id", "payload"),
      "doc_id", "payload", frameSamples = 8)
      .orderBy($"frame").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // frame 0 signs +−+−++−+ -> 6 crossings; frame 1 ++++−−−− -> 1
    // (the 8→7? boundary pair (idx 7, idx 8) belongs to neither)
    assert(out.toSeq == Seq((0L, 8L, 6L, 213L), (1L, 8L, 1L, 20L)))
  }

  test("hits: one half-step pair exact on a hand graph (e6 " +
    "sum-normalized, truncating division)") {
    // edges 1→a, 1→b, 2→b (a=10, b=11): auth raw (1e6, 2e6) →
    // (333333, 666666); hub raw (999999, 666666) over total 1666665
    // → (600000, 400000) — both divisions land exact
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L)).toDF("s", "d")
    val out = graft.operators.GraphRank
      .hits(edges, "s", "d", iterations = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "hub", 600000L), (2L, "hub", 400000L),
      (10L, "auth", 333333L), (11L, "auth", 666666L)))
  }

  test("spearman: tie-averaged ranks via the doubled-rank identity; " +
    "perfect inverse thirds on a hand fixture") {
    // x [1,2,2,4] -> avg ranks [1,2.5,2.5,4]; y [10,20,20,5] ->
    // [2,3.5,3.5,1]; rho = -1/3 exactly, cov_num over DOUBLED ranks
    // = 4·94 - 20·20 = -24
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 20L),
      ("g", 4L, 5L)).toDF("k", "x", "y")
    val r = graft.operators.GroupStats
      .spearman(df, Seq("k"), $"x", $"y").collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("cov_num") == -24.0)
    assert(r.getAs[Double]("rho") == -0.333333)
  }

  test("kCenterGreedy: md5 seed, farthest-point steps, distance ties " +
    "broken by id ascending; radius curve exact") {
    // md5 order of "1".."5": 4 < 1 < 2 < 5 < 3 -> seed is id 4 (5,5).
    // step 1: ids 1,2,3 all sit at d² = 5e13 from the seed, id 1 wins
    // the tie; step 2: id 5 is pinned at 1e10 to id 1, ids 2/3 tie at
    // 5e13 again -> id 2.
    val emb = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(0f, 10f)),
      (4L, Seq(5f, 5f)), (5L, Seq(0.1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Prototypes
      .kCenterGreedy(emb, "vec_id", "embedding", k = 3)
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 4L, 0L),
      (1L, 1L, 50000000000000L),
      (2L, 2L, 50000000000000L)))
  }
}
