// Lives under org.apache.spark.sql because Expression/Column bridging
// (ExpressionUtils) and AbstractDataType are private[sql] in Spark 4.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Lemmatizer

/** Native array-level noun lemmatization (the reference's v1 keyword
  * chain step, word_count.py:36-37,62).
  *
  * Promoted from a `udf((ts: Seq[String]) => ts.map(...))`: the UDF
  * route deserializes the whole UnsafeArrayData into a boxed
  * `List[String]` and re-encodes the result per row; this expression
  * walks the array in place and emits one GenericArrayData, staying
  * inside whole-stage codegen (the generated code calls back into
  * this instance via the references array — one virtual call per ROW,
  * not per element, and zero encoder round-trips).
  *
  * Rule semantics are exactly `Lemmatizer.noun` — the scaladoc there
  * is the acceptance contract (golden spec pins it).
  */
case class LemmatizeNouns(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "lemmatize_nouns"

  def lemmaAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        out(i) = UTF8String.fromString(Lemmatizer.noun(s.toString))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = lemmaAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lemmatizeNouns", this,
      classOf[LemmatizeNouns].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lemmaAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LemmatizeNouns {
  def column(c: Column): Column =
    ExpressionUtils.column(LemmatizeNouns(ExpressionUtils.expression(c)))
}
