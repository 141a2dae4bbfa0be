package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftExpressions
import graft.functions.VectorFns

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.5f, -0.5f, 0.25f), Array(-1.0f, 2.0f, 4.0f))
  ).toDF("id", "a", "b")

  test("native cosine is bit-identical to the HOF reference formulation") {
    val out = vecs.select($"id",
      GraftExpressions.cosine_similarity($"a", $"b").as("native"),
      VectorFns.cosine($"a", $"b").as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}")
    }
    val identical = out.find(_.getLong(0) == 1L).get.getDouble(1)
    assert(math.abs(identical - 1.0) < 1e-12)
    assert(out.find(_.getLong(0) == 2L).get.getDouble(1) == 0.0)
  }

  test("null inputs yield null; double arrays accepted") {
    val df = Seq((1L, Some(Array(1.0, 2.0)), Some(Array(2.0, 4.0))),
      (2L, None, Some(Array(1.0, 1.0))))
      .toDF("id", "a", "b")
    val out = df.select($"id",
      GraftExpressions.cosine_similarity($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L) == None)
    assert(math.abs(out(1L).get.asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("SQL registration makes cosine_similarity callable from spark.sql") {
    GraftExpressions.register(spark)
    vecs.createOrReplaceTempView("cos_test_vecs")
    val out = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM cos_test_vecs WHERE id = 1")
      .collect()(0).getDouble(1)
    assert(math.abs(out - 1.0) < 1e-12)
  }
}
