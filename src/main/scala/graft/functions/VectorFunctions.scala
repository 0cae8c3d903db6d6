package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column helpers over `ArrayType(FloatType)`.
  *
  * All arithmetic is done in double via codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDF/serialization cost, stays inside
  * whole-stage codegen, and the sequential left-to-right fold makes the
  * floating-point result deterministic and engine-reproducible.
  */
object VectorFunctions {

  /** Element-wise cast to double (float→double is exact). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — the codegen'd native expression ([[VectorExpressions]]).
    * Same sequential fold as the HOF formulation below, ~100× faster in
    * the all-pairs hot path.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.vec_dot(a, b)

  /** Reference HOF formulation (kept for cross-checking the expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b) / (|a| * |b|). Inputs must be double
    * arrays (see [[asDouble]]).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
