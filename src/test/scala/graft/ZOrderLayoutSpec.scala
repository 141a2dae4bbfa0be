package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrderLayout

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  // a 32x32 grid: both dims uniform and independent
  private def grid = (for (a <- 0 until 32; b <- 0 until 32)
    yield (a * 32L + b, a.toDouble, b.toDouble))
    .toDF("id", "x", "y").repartition(8)

  test("z-value interleaves bits: locality in both dims") {
    val out = ZOrderLayout.assign(grid, "x", "y", bits = 5)
    // corners: (0,0) -> 0; (max,max) -> all bits set
    val z00 = out.filter(col("x") === 0.0 && col("y") === 0.0)
      .select("z").as[Long].head()
    val zmm = out.filter(col("x") === 31.0 && col("y") === 31.0)
      .select("z").as[Long].head()
    assert(z00 === 0L)
    assert(zmm === (1L << 10) - 1)
    // z is a bijection on the grid (quantization is exact here)
    assert(out.select("z").distinct().count() === 1024L)
  }

  test("layout keeps BOTH dimensions tight per partition vs single-column sort") {
    def avgSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val zed = ZOrderLayout.layout(grid, "x", "y", bits = 5, nFiles = 16)
    val singleSort = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val (zx, zy) = avgSpans(zed)
    val (sx, sy) = avgSpans(singleSort)
    // single-column sort: x tight, y spans the whole domain (~31)
    assert(sx < 4.0 && sy > 25.0)
    // z-order: both dims bounded well below the full span
    assert(zx < 16.0, s"x span $zx")
    assert(zy < 16.0, s"y span $zy")
  }

  test("constant dimension quantizes to zero; nulls give null z") {
    val df = Seq((1L, Some(5.0), 1.0), (2L, Some(9.0), 1.0),
      (3L, None, 1.0)).toDF("id", "x", "y")
    val out = ZOrderLayout.assign(df, "x", "y", bits = 4)
    // y constant -> only x contributes (even bit positions)
    val zs = out.filter(col("x").isNotNull)
      .select("z").as[Long].collect()
    zs.foreach(z => assert((z & 0xAAAAAAAAL) === 0L, s"odd bits set in $z"))
    assert(out.filter(col("id") === 3L).select("z").collect()(0).isNullAt(0))
  }
}
