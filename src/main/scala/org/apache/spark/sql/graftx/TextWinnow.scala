// Lives under org.apache.spark.sql for the Column/Expression bridge
// (private[sql] in Spark 4).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: winnowing fingerprints (MOSS — Schleimer,
  * Wilkerson, Aiken, SIGMOD 2003) straight from the UTF-8 bytes.
  * Semantics are IDENTICAL to graft.text.Fingerprint.winnow (pinned by
  * a GraftProps property): normalize to [a-z0-9] (arithmetic lowercase,
  * non-ASCII drops out exactly like the regex), rolling 61-bit
  * polynomial k-gram hashes, rightmost-minimum per w-window, distinct
  * in pick order. No String materialization, no Seq boxing — the
  * fingerprint array goes out as UnsafeArrayData.
  */
case class TextWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_winnow"

  override def nullSafeEval(input: Any): Any =
    TextWinnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", TextWinnow,
      "org.apache.spark.sql.graftx.TextWinnow$")
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextWinnow {

  def column(text: Column, k: Int = 7, w: Int = 4): Column =
    ExpressionUtils.column(TextWinnow(ExpressionUtils.expression(text), k, w))

  private final val Base = 257L
  private final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val res = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    if (res >= Mod) res - Mod else res
  }

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // normalize in place into a local buffer: [a-z0-9] only
    val s = new Array[Byte](bytes.length)
    var m = 0
    var bi = 0
    while (bi < bytes.length) {
      val c = bytes(bi) & 0xff
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        s(m) = c.toByte; m += 1
      } else if (c >= 'A' && c <= 'Z') {
        s(m) = (c + 32).toByte; m += 1
      }
      bi += 1
    }
    if (m < k) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    var pow = 1L
    var p = 0
    while (p < k) { pow = mulmod(pow, Base); p += 1 }
    var h = 0L
    val hashes = new Array[Long](m - k + 1)
    var i = 0
    while (i < m) {
      h = (mulmod(h, Base) + (s(i) & 0xffL)) % Mod
      if (i >= k)
        h = (h - mulmod((s(i - k) & 0xffL), pow) % Mod + Mod) % Mod
      if (i >= k - 1) hashes(i - k + 1) = h
      i += 1
    }
    // winnow: rightmost min per window, dedupe consecutive picks, then
    // distinct in pick order (matches Fingerprint.winnow exactly)
    val picked = new Array[Long](hashes.length)
    var nPicked = 0
    var last = -1
    var start = 0
    while (start + w <= hashes.length) {
      var mi = start
      var j = start
      while (j < start + w) { if (hashes(j) <= hashes(mi)) mi = j; j += 1 }
      if (mi != last) { picked(nPicked) = hashes(mi); nPicked += 1; last = mi }
      start += 1
    }
    if (nPicked == 0) {
      var mn = hashes(0)
      var q = 1
      while (q < hashes.length) { if (hashes(q) < mn) mn = hashes(q); q += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(mn))
    }
    // order-preserving distinct via a small hash set
    val seen = new java.util.HashSet[Long](nPicked * 2)
    val out = new Array[Long](nPicked)
    var nOut = 0
    var r = 0
    while (r < nPicked) {
      if (seen.add(picked(r))) { out(nOut) = picked(r); nOut += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }
}
