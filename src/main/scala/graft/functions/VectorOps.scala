package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Implemented as compiled Scala UDFs rather than higher-order
  * `aggregate`/`zip_with` expressions: higher-order functions don't
  * participate in whole-stage codegen and their interpreted eval costs
  * ~1µs per element — a UDF evaluates its children once and runs a tight
  * JIT'd loop (measured ~4x faster on the pair fan-outs).
  *
  * Determinism: a sequential left fold with float->double cast BEFORE
  * each multiply — the exact op sequence DuckDB's
  * `list_sum(list_transform(list_zip(a,b), x -> CAST(..)*CAST(..)))`
  * performs, so oracle comparison is bit-exact. (DuckDB's own
  * `list_dot_product` accumulates in float and is NOT parity-safe.)
  */
object VectorOps {

  // Array params, not Seq: Spark's Scala-2.13 deserializer gives Seq as
  // List (O(i) apply), silently quadratic in an indexed loop.
  private val dotUdf = udf { (a: Array[Float], b: Array[Float]) =>
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Dot product with double accumulation. */
  def dot(a: Column, b: Column): Column = dotUdf(a, b)

  /** L2 norm (same fold order as `dot` for cross-engine parity). */
  def norm(a: Column): Column = sqrt(dotUdf(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
