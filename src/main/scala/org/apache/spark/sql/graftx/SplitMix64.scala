// Lives under org.apache.spark.sql because Expression/Column bridging
// (ExpressionUtils) is private[sql] in Spark 4.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** SplitMix64 finalizer (Steele, Lea & Flood 2014, public domain) of a
  * BIGINT — the id-scrambling hash behind the ANN training-sample
  * gates.
  *
  * Why not Spark's builtin `hash()`: the sample gate must be
  * REPLAYABLE by the DuckDB oracle, and Murmur3's seed plumbing is a
  * Spark implementation detail, while this is four shifts, two xors
  * and two wrapping multiplies — exactly expressible in HUGEINT SQL
  * with the split-multiplication technique the MinHash oracle already
  * uses. Why an Expression and not `expr(...)` arithmetic: Spark 4
  * runs ANSI mode by default, where a wrapping long multiply is an
  * overflow ERROR; Java long arithmetic wraps by definition, ANSI or
  * not.
  */
case class SplitMix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override def nullSafeEval(input: Any): Any =
    SplitMix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SplitMix64 {
  /** Reference JVM implementation (shared by tests and oracles). */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def column(c: Column): Column =
    ExpressionUtils.column(SplitMix64(ExpressionUtils.expression(c)))
}
