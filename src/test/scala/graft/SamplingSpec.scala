package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic curation sampling: same key → same decision, everywhere. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("hashSample is reproducible and partitioning-independent") {
    val a = Sampling.hashSample(ids, "id", 64).as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(17), "id", 64)
      .as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    // 64/256 = 25% expected; binomial bounds at n=2000 (±5σ ≈ ±97)
    assert(a.size > 400 && a.size < 600, s"sample size ${a.size}")
    // edge rates
    assert(Sampling.hashSample(ids, "id", 0).isEmpty)
    assert(Sampling.hashSample(ids, "id", 256).count() == 2000)
  }

  test("splitByHash partitions rows completely, disjointly, and stably") {
    val split = Sampling.splitByHash(ids, "id",
      Seq(200, 32, 24), Seq("train", "val", "test"))
    val byLabel = split.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 2000) // complete and disjoint
    // expected 1562.5 / 250 / 187.5; allow ±5σ
    assert(byLabel("train") > 1450 && byLabel("train") < 1680)
    assert(byLabel("val") > 160 && byLabel("val") < 340)
    assert(byLabel("test") > 110 && byLabel("test") < 270)
    // a row's split never changes when the frame is transformed around it
    val again = Sampling.splitByHash(ids.repartition(7), "id",
      Seq(200, 32, 24), Seq("train", "val", "test"))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
    // the sample IS the leading band: hashSample(200) == the train split
    val sampled = Sampling.hashSample(ids, "id", 200).as[Long].collect().toSet
    val train = split.filter($"split" === "train").select($"id")
      .as[Long].collect().toSet
    assert(sampled == train)
  }

  test("null keys: always excluded from samples, null split — never a default label") {
    val withNulls = (Seq(Some(1L), Some(2L), None, None))
      .toDF("id")
    // excluded at a partial rate AND at the full rate (no discontinuity)
    assert(Sampling.hashSample(withNulls, "id", 128)
      .filter($"id".isNull).isEmpty)
    assert(Sampling.hashSample(withNulls, "id", 256).count() == 2)
    // null key -> null split, not silently the last band's label
    val split = Sampling.splitByHash(withNulls, "id",
      Seq(128, 128), Seq("a", "b"))
    assert(split.filter($"id".isNull && $"split".isNotNull).isEmpty)
    assert(split.filter($"id".isNotNull && $"split".isNull).isEmpty)
  }

  test("stratifiedSample takes exact quotas, deterministically") {
    val rows = (1L to 900L).map(i => (i, s"lang${i % 3}")) ++
      Seq((901L, "rare")) // stratum smaller than k
    val df = rows.toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "id", k = 25)
    val counts = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("lang0" -> 25L, "lang1" -> 25L, "lang2" -> 25L,
      "rare" -> 1L))
    // members (not just counts) are partitioning-independent
    val again = Sampling.stratifiedSample(df.repartition(13), "lang", "id", 25)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // selection order is the hash order: equals the brute-force pick
    val brute = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap { g =>
        g.sortBy { case (id, _) =>
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes).map("%02x".format(_)).mkString
        }.take(25)
      }.toSet
    assert(out.as[(Long, String)].collect().toSet == brute)
  }

  test("stratifiedSample plan has a map-side partial top-k below the shuffle") {
    val df = (1L to 100L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val plan = Sampling.stratifiedSample(df, "lang", "id", 5)
      .queryExecution.executedPlan.toString
    // WindowGroupLimit(Partial) before the exchange is what bounds the
    // per-stratum reducer to k*P candidate rows instead of the corpus
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    val partialIdx = plan.indexOf("WindowGroupLimit")
    assert(plan.indexOf("WindowGroupLimit", partialIdx + 1) > 0,
      "expected both partial and final WindowGroupLimit nodes")
  }

  test("stratifiedSample: null keys excluded, null stratum is a stratum") {
    val df = Seq((Some(1L), Some("a")), (Some(2L), Some("a")),
      (None, Some("a")), (Some(3L), None), (Some(4L), None))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "id", k = 10)
    assert(out.filter($"id".isNull).isEmpty)
    assert(out.filter($"lang".isNull).count() == 2)
    assert(out.count() == 4)
  }

  test("splitByHash validates weights") {
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(ids, "id", Seq(100, 100), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(ids, "id", Seq(256), Seq("a", "b"))
    }
  }
}
