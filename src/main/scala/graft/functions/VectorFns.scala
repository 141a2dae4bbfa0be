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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature: bit j = sign of the dot product with
    * a deterministic pseudo-random ±1 hyperplane derived from
    * xxhash64(j, dim). Returns an array<int> of `bits` sign bits. */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    transform(sequence(lit(0), lit(bits - 1)), j => {
      val proj = aggregate(
        zip_with(d(vec), sequence(lit(0), size(vec) - 1),
          (x, i) => when(shiftright(xxhash64(j, i), 7).bitwiseAND(1) === 1, x).otherwise(-x)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1).otherwise(0)
    })
}
