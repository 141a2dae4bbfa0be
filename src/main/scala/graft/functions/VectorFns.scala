package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, computed in double
  * precision via built-in higher-order functions (zip_with / aggregate)
  * — codegen-compatible, no UDF, no driver-side loops.
  */
object VectorFns {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, v) => acc + v * v))

  /** HOF reference implementation (interpreted; kept for cross-checks). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Production cosine: the native codegen'd Catalyst expression
    * (bit-identical to `cosine`, one fused loop). */
  def cosineNative(a: Column, b: Column): Column =
    graft.expressions.GraftExpressions.cosine_similarity(a, b)

}
