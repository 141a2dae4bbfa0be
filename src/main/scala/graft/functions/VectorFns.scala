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

  /** Statically-expanded (known-dimension) variants: element_at chains
    * are whole-stage-codegen'd while higher-order-function lambdas are
    * interpreted — for fixed embedding dims this is the hot-path form.
    * Left-fold order matches the HOF versions, so values are identical.
    */
  def dotStatic(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  def normStatic(a: Column, dim: Int): Column =
    sqrt((1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _))

  def cosineStatic(a: Column, b: Column, dim: Int): Column =
    dotStatic(a, b, dim) / (normStatic(a, dim) * normStatic(b, dim))

  /** Random-hyperplane LSH signature with plan-time ±1 planes (derived
    * from a deterministic Scala hash of (bit, dim index)), statically
    * expanded per dimension — fully codegen'd. Returns array<int> of
    * `bits` sign bits. */
  def hyperplaneSignature(vec: Column, bits: Int, dim: Int): Column = {
    def positive(j: Int, i: Int): Boolean =
      (scala.util.hashing.MurmurHash3.productHash((j, i)) & 1) == 1
    array((0 until bits).map { j =>
      val proj = (1 to dim).map { i =>
        val x = element_at(vec, i).cast("double")
        if (positive(j, i)) x else -x
      }.reduce(_ + _)
      when(proj >= 0, 1).otherwise(0)
    }: _*)
  }
}
