package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{SimilaritySearch, SkewJoin}
import graft.sinks.BucketedTables

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.95f, 0.05f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.9f, 0.1f)),
    (5L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("exact embedding near-dup matches hand-computed cosines") {
    val out = SimilaritySearch.embeddingNearDupExact(vecs, "vec_id", "embedding", 0.99)
      .select($"id_a", $"id_b").rowsSet
    // cos(0,1)=0.9939, cos(0,2)=0.9986, cos(1,2)=0.9985, cos(3,4)=0.9939
    assert(out == Set(Seq(0L, 1L), Seq(0L, 2L), Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("IVF probes nearest clusters and ranks by cosine") {
    val out = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding",
      queryId = 0L, k = 3, nCentroids = 3, nProbe = 1, iterations = 2)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    // probe-1 around the x-axis cluster must surface 2 then 1 first
    assert(out.take(2) == Seq(2L, 1L))
    assert(!out.contains(0L))
  }

  test("ivfIndex + ivfProbe equals one-shot ivfTopK, quantizer reusable") {
    val index = SimilaritySearch.ivfIndex(vecs, "vec_id", "embedding",
      nCentroids = 3, iterations = 2)
    val oneShot = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding",
      queryId = 0L, k = 3, nCentroids = 3, nProbe = 1, iterations = 2)
      .collect().map(_.getLong(0)).toSeq
    val probed = SimilaritySearch.ivfProbe(index, "vec_id", 0L, 3, nProbe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(probed == oneShot)
    // the SAME quantizer answers a different query without rebuilding:
    // query 3's own cell holds 4 (cos 0.9939) — nProbe=1 must surface it
    val probed3 = SimilaritySearch.ivfProbe(index, "vec_id", 3L, 3, nProbe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(probed3.headOption.contains(4L) && !probed3.contains(3L))
  }

  test("salted join equals plain join; two-phase agg equals plain agg") {
    val big = (1L to 1000L).map(i => (i, s"k${i % 3}", i.toDouble)).toDF("id", "k", "v")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "z")).toDF("k", "tag")
    val plain = big.join(small, Seq("k"), "inner")
      .select($"id", $"tag").rowsSet
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 7, bigUnique = $"id")
      .select($"id", $"tag").rowsSet
    assert(salted == plain)
    val plainAgg = big.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum")).rowsSet
    val twoPhase = SkewJoin.twoPhaseAgg(big, "k", salts = 7, valueCol = "v").rowsSet
    assert(twoPhase == plainAgg)
  }

  test("bucketed tables join without exchange or sort") {
    val wh = Files.createTempDirectory("graft_buckets")
    val a = (1L to 500L).map(i => (i, i * 2.0)).toDF("k", "va")
    val b = (1L to 500L).map(i => (i, i * 3.0)).toDF("k", "vb")
    BucketedTables.writeBucketed(a, "graft_ta", s"$wh/ta", "k", 4)
    BucketedTables.writeBucketed(b, "graft_tb", s"$wh/tb", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.read(spark, "graft_ta")
        .join(BucketedTables.read(spark, "graft_tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
