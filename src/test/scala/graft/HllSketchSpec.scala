package graft

import org.apache.spark.sql.functions._
import graft.expressions.HllSketch

/** HLL register-summary sketch: estimate accuracy, merge determinism
  * under repartitioning, and the production linear-counting path. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
    val r = df.agg(HllSketch.hll_sketch(col("k")).as("h"))
      .select(col("h.v_zero"), col("h.s40"), col("h.est_hll")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("raw estimate lands within the HLL error envelope at n=10000") {
    val df = spark.range(10000).select(concat(lit("user-"),
      col("id").cast("string")).as("k"))
    val (vZero, s40, est) = summarize(df)
    // sigma = 1.04/sqrt(256) ~ 6.5%; assert a loose 3-sigma band
    assert(math.abs(est - 10000.0) / 10000.0 < 0.2, s"est=$est")
    assert(vZero < 10 && s40 > 0)
  }

  test("register summary is partitioning-independent (mergeable state)") {
    val df = spark.range(5000).select(concat(lit("u"),
      col("id").cast("string")).as("k"))
    val a = summarize(df)
    val b = summarize(df.repartition(13))
    assert(a == b)
  }

  test("production estimator applies linear counting at small n") {
    val df = Seq("a", "b", "c").toDF("k")
    val (vZero, s40, _) = summarize(df)
    assert(vZero >= 253L) // 3 distinct hashes fill at most 3 buckets
    val est = HllSketch.estimate(vZero, s40)
    assert(est > 0.0 && est < 10.0, s"linear-counting est=$est")
  }

  test("nulls are skipped; empty group emits the all-zero registers") {
    val df = Seq[Option[String]](None, None).toDF("k")
    val (vZero, s40, _) = summarize(df)
    assert(vZero == 256L && s40 == 256L * (1L << 40))
  }

  test("sharded register roll-up equals the one-shot sketch exactly") {
    val df = spark.range(4000).select(concat(lit("x"),
        col("id").cast("string")).as("k"),
      (col("id") % 7).as("shard"))
    val oneShot = summarize(df)
    val rolled = df.groupBy(col("shard"))
      .agg(HllSketch.hll_registers(col("k")).as("regs"))
      .agg(HllSketch.hll_merge(col("regs")).as("m"))
      .select(HllSketch.hll_summary(col("m")).as("h"))
      .select(col("h.v_zero"), col("h.s40"), col("h.est_hll")).collect()(0)
    assert((rolled.getLong(0), rolled.getLong(1), rolled.getDouble(2))
      == oneShot)
  }

  test("keySkew reports hot keys with exact shares") {
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("k")
    val out = graft.operators.Profile.keySkew(df, "k", topK = 2)
    assert(out.rowsSet == Set(
      Seq(1L, 6L, 3L, 10L, 6000L),
      Seq(2L, 3L, 3L, 10L, 3000L)))
    graft.Caches.unpersistAll()
  }
}
