package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built on
  * the native [[DotProduct]] codegen expression (no UDF serde, stays in
  * whole-stage codegen; the earlier higher-order-function formulation
  * was interpreted and ~1µs/element).
  *
  * Determinism: a sequential left fold with float->double cast BEFORE
  * each multiply — the exact op sequence DuckDB's
  * `list_sum(list_transform(list_zip(a,b), x -> CAST(..)*CAST(..)))`
  * performs, so oracle comparison is bit-exact. (DuckDB's own
  * `list_dot_product` accumulates in float and is NOT parity-safe.)
  */
object VectorOps {

  /** Dot product with double accumulation (native codegen expression). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.DotProduct.column(a, b)

  /** L2 norm (same fold order as `dot` for cross-engine parity). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
