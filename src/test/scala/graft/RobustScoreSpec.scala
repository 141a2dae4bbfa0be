package graft

import org.apache.spark.sql.functions._
import graft.operators.RobustScore

class RobustScoreSpec extends SparkSpec {
  import spark.implicits._

  test("median/MAD are exact; an outlier barely moves robust_z of the bulk") {
    // 1..9 plus a wild outlier — median 5.5 -> med2=11, deviations
    // (x2 units) |2x-11| = 9,7,5,3,1,1,3,5,7,1989 -> sorted p50 lerp
    val rows = ((1 to 9).map(i => ("g", i.toLong)) :+ ("g", 1000L))
      .toDF("grp", "u")
    val out = RobustScore.madZScore(rows, Seq("grp"), col("u"))
    val med2 = out.select("med2").as[Long].head()
    assert(med2 === 11L) // 2 * 5.5
    val mad4 = out.select("mad4").as[Long].head()
    assert(mad4 === 10L) // deviations sorted: 1,1,1,3,3,5,5,7,7,1989 -> p50 = (3+3)+... lerp -> 5 -> x2? verified: 10
    val zBulk = out.filter(col("u") === 5L)
      .select("robust_z").as[Double].head()
    assert(math.abs(zBulk) < 0.3)
    val zOut = out.filter(col("u") === 1000L)
      .select("robust_z").as[Double].head()
    assert(zOut > 100.0) // the outlier itself scores enormous
    // contrast: mean/std z of the bulk under this outlier would be
    // compressed toward 0 far more than the robust score
  }

  test("zero MAD (constant majority) yields NULL, not infinity") {
    val rows = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 9L))
      .toDF("grp", "u")
    val out = RobustScore.madZScore(rows, Seq("grp"), col("u"))
    assert(out.select("robust_z").collect().forall(_.isNullAt(0)))
  }

  test("partition-invariant (exact integer intermediates)") {
    val rows = (1 to 500).map(i => ("g", (i * 37 % 211).toLong))
      .toDF("grp", "u")
    val a = RobustScore.madZScore(rows, Seq("grp"), col("u"))
      .select("u", "robust_z").as[(Long, Double)].collect().toSet
    val b = RobustScore.madZScore(rows.repartition(13), Seq("grp"),
        col("u"))
      .select("u", "robust_z").as[(Long, Double)].collect().toSet
    assert(a === b)
  }

  test("NULL group key is a real group: med2/mad4/robust_z attach to its rows") {
    val rows = ((1 to 9).map(i => (null.asInstanceOf[String], i.toLong)) ++
      Seq(("g", 5L))).toDF("grp", "u")
    val out = RobustScore.madZScore(rows, Seq("grp"), col("u"))
    val nullRows = out.filter(col("grp").isNull)
    assert(nullRows.count() === 9)
    // median of 1..9 is 5 → med2 = 10; a null-unsafe join would leave
    // every stat NULL
    assert(nullRows.select("med2").as[Long].collect().forall(_ == 10L))
    assert(nullRows.filter(col("robust_z").isNull).count() === 0)
  }

  test("scalable path (range-partitioned rank) is value-equal to the window path") {
    val rows = ((1 to 1500).map(i => ("big", (i * 53 % 211).toLong)) ++
      (1 to 9).map(i => ("small", i.toLong))).toDF("grp", "u")
      .repartition(11)
    def run(scalable: Boolean) = RobustScore.madZScore(
      rows, Seq("grp"), col("u"), scalable = scalable)
      .select("grp", "u", "med2", "mad4", "robust_z")
      .collect().map(_.toSeq).toSet
    assert(run(scalable = false) === run(scalable = true))
    Caches.unpersistAll(blocking = true)
  }
}
