package graft

import org.apache.spark.sql.functions._
import graft.expressions.CountMinSketchAgg.{cms_estimate, cms_sketch}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val items =
    (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ (1 to 200).map(i => s"t$i"))
      .toDF("item").repartition(7)

  test("estimates never undercount; exact when width is ample") {
    val sk = items.agg(cms_sketch(col("item"), 4, 4096).as("sk"))
    val est = items.distinct()
      .crossJoin(broadcast(sk))
      .withColumn("est", cms_estimate(col("sk"), col("item"), 4, 4096))
    val exact = items.groupBy("item").agg(count(lit(1)).as("tru"))
    val joined = est.join(exact, "item")
    assert(joined.filter(col("est") < col("tru")).isEmpty)
    // 270 items in 4x4096 counters: min-over-4-rows collisions are
    // vanishingly rare — the deterministic hashes give exact values here
    assert(joined.filter(col("est") =!= col("tru")).isEmpty)
  }

  test("merge is order/partitioning independent") {
    val a = items.agg(cms_sketch(col("item"), 4, 512).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()
    val b = items.repartition(31).agg(cms_sketch(col("item"), 4, 512).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()
    assert(a === b)
    assert(a.sum === 270L * 4) // every occurrence lands in each row once
  }

  test("narrow sketch overcounts but stays within the epsilon bound") {
    val n = 270L
    val width = 32
    val sk = items.agg(cms_sketch(col("item"), 4, width).as("sk"))
    val est = items.distinct().crossJoin(broadcast(sk))
      .withColumn("est", cms_estimate(col("sk"), col("item"), 4, width))
    val exact = items.groupBy("item").agg(count(lit(1)).as("tru"))
    val joined = est.join(exact, "item")
    assert(joined.filter(col("est") < col("tru")).isEmpty)
    // some overcount must exist at width 32 with 270 items
    assert(joined.filter(col("est") > col("tru")).count() > 0)
    // and the classic bound holds comfortably in aggregate
    val maxExcess = joined.select(max(col("est") - col("tru"))).as[Long].head()
    assert(maxExcess <= (3.0 * math.E * n / width).toLong,
      s"max excess $maxExcess")
  }

  test("nulls are skipped") {
    val df = Seq(Some("x"), None, Some("x")).toDF("item")
    val sk = df.agg(cms_sketch(col("item"), 2, 16).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()
    assert(sk.sum === 2L * 2)
  }
}
