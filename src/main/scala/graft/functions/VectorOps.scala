package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built on
  * codegen'd higher-order functions (no UDFs, stays inside whole-stage
  * codegen).
  *
  * Determinism note: `aggregate` is a sequential left fold, and every
  * product casts float->double BEFORE multiplying. DuckDB's
  * `list_sum(list_transform(list_zip(a,b), x -> CAST(..)*CAST(..)))`
  * computes the same fold, so oracle comparison is bit-exact (verified;
  * DuckDB's own `list_dot_product` accumulates in float and is NOT
  * parity-safe).
  */
object VectorOps {

  /** Dot product with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm (same fold order as `dot` for cross-engine parity). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
