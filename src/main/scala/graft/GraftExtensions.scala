package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{CosineSimilarity, HyperplaneSignature, KMVSketch, SquaredDistance}

/** SparkSessionExtensions entry point: makes the library's custom
  * Catalyst expressions available to ANY session (SQL included) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the standard injection hook, so `SELECT cosine_similarity(a, b)`
  * works from pure SQL without programmatic registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two numeric arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("squared_distance"),
      info("squared_distance", "squared_distance(a, b) - squared L2 distance"),
      (exprs: Seq[Expression]) => SquaredDistance(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_signature"),
      info("hyperplane_signature",
        "hyperplane_signature(vec, bits, dim) - packed LSH sign bits"),
      (exprs: Seq[Expression]) => new HyperplaneSignature(exprs(0),
        intArg(exprs(1), "bits"), intArg(exprs(2), "dim"))))
    ext.injectFunction((FunctionIdentifier("approx_distinct_kmv"),
      info("approx_distinct_kmv",
        "approx_distinct_kmv(col, k) - KMV sketch distinct estimate"),
      (exprs: Seq[Expression]) =>
        KMVSketch(exprs(0), intArg(exprs(1), "k")).toAggregateExpression()))
  }
}
