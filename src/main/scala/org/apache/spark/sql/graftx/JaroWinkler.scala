// Lives under org.apache.spark.sql for the same reason as DotProduct:
// Column/Expression bridging is private[sql] in Spark 4.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity — the classic
  * record-linkage scalar for short-string fuzzy matching (names,
  * titles, identifiers), complementing the set-based Jaccard family
  * with a char-order-aware score. Promoted to a native expression so
  * probe-vs-corpus candidate fan-outs stay inside whole-stage codegen
  * (the generated code is one static call — no UDF serde).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the
  * oracle), verified bit-exact over a divergence-hunting case set:
  * standard Jaro with the floor((max-len)/2)-1 match window and
  * half-transposition count, Winkler prefix boost p=0.1 on up to 4
  * leading chars applied only when jaro > 0.7, and — DuckDB's edge
  * contract — EITHER input empty scores 0.0, even when both are
  * empty. Float-op order `(m/l1 + m/l2 + (m-t)/m)/3` and
  * `j + l*0.1*(1-j)` match DuckDB's, so raw doubles agree bitwise.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftx.JaroWinkler" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** The whole scalar on UTF-16 char arrays (the corpus is ASCII; a
    * divergence on supplementary chars vs DuckDB's byte-wise walk
    * would surface in the oracle, which pins current behavior).
    */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB: empty scores 0, always
    if (s1 == s2) return 1.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var done = false
      while (!done && j < hi) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1 - j)
    }
  }
}
