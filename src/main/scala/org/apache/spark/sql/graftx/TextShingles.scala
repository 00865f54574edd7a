// Lives under org.apache.spark.sql for the Column/Expression bridge
// (private[sql] in Spark 4).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: text -> SORTED DISTINCT 64-bit hashes of its
  * word 3-gram shingles, in ONE pass over the UTF-8 bytes.
  *
  * Replaces the two-stage `shingleUdf(TextOps.tokens(clean(text)))`
  * chain, which paid: a regexp_replace materialization, a regex split
  * into an array of Strings, an interpreted array filter, the
  * catalyst<->Scala serde of ~100 Strings per document, and a String
  * allocation per shingle for `mkString`. Here tokenization is the
  * byte scan itself ([a-zA-Z] runs, lowercased by arithmetic — any
  * non-letter byte including multi-byte UTF-8 breaks a token, exactly
  * the `[^a-zA-Z ]`->space regex semantics), each token is FNV-hashed
  * as it is scanned, and a rolling window mixes 3 consecutive token
  * hashes into the shingle hash. No Strings are ever allocated.
  *
  * Hash VALUES differ from the old UDF on purpose (they only need to
  * be self-consistent): the DuckDB oracle compares shingle SETS, and
  * set cardinalities survive any injective-in-practice hash.
  */
case class TextShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_shingles"

  override def nullSafeEval(input: Any): Any =
    TextShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", TextShingles,
      "org.apache.spark.sql.graftx.TextShingles$")
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: sorted shingle-hash array -> banded MinHash
  * bucket keys. k = bands*rows permutations h_i(x) = (a_i*x + b_i)
  * mod p over the shingle hashes; each band's row-mins mix into one
  * 64-bit key tagged with the band index in the high bits so bands
  * never collide across each other. Permutation params are seeded and
  * baked into the expression (driver-side constants, shipped with the
  * plan).
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  @transient private lazy val perms: (Array[Long], Array[Long]) =
    MinHashBands.perms(bands * rowsPerBand)

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData],
      perms._1, perms._2, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhasher", MinHashBands,
      "org.apache.spark.sql.graftx.MinHashBands$")
    val as = ctx.addReferenceObj("permsA", perms._1, "long[]")
    val bs = ctx.addReferenceObj("permsB", perms._2, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $ref.compute($in, $as, $bs, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {

  def column(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(MinHashBands(
      ExpressionUtils.expression(shingles), bands, rowsPerBand))

  private final val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic permutation params (seeded, reproducible). */
  private[graftx] def perms(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = 1L + rnd.nextInt(Int.MaxValue - 1).toLong
      bs(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (as, bs)
  }

  /** (p, a_p, b_p) permutation rows — the oracle-generation seam: the
    * seeded params are deterministic, so baking them into the DuckDB
    * oracle as a VALUES table lets it rebuild identical signatures.
    */
  def permRows(k: Int): Seq[(Int, Long, Long)] = {
    val (as, bs) = perms(k)
    (0 until k).map(i => (i, as(i), bs(i)))
  }

  def compute(shingles: ArrayData, as: Array[Long], bs: Array[Long],
      bands: Int, rowsPerBand: Int): ArrayData = {
    val n = shingles.numElements()
    // no bands for shingle-less docs: otherwise every empty doc would
    // share the MaxValue-signature bucket and pair quadratically
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = java.lang.Math.floorMod(shingles.getLong(i), MersennePrime)
      var p = 0
      while (p < k) {
        val h = (as(p) * x + bs(p)) % MersennePrime
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0L
      var r = 0
      while (r < rowsPerBand) {
        h = h * 0x9E3779B97F4A7C15L + mins(b * rowsPerBand + r)
        r += 1
      }
      out(b) = (b.toLong << 56) | (TextShingles.fmix64(h) >>> 8)
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native expression: text -> 64-bit SimHash over its DISTINCT token
  * hashes, one pass over the UTF-8 bytes + a sort/dedupe of the token
  * hash array (no Strings, no UDF serde, codegen-friendly). NULL for
  * token-free text so callers can filter it like the UDF's empty case.
  */
case class TextSimHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "text_simhash"

  override def nullSafeEval(input: Any): Any =
    TextSimHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhasher", TextSimHash,
      "org.apache.spark.sql.graftx.TextSimHash$")
    nullSafeCodeGen(ctx, ev, in => s"""
      |Object r = $ref.compute($in);
      |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSimHash {

  def column(text: Column): Column =
    ExpressionUtils.column(TextSimHash(ExpressionUtils.expression(text)))

  /** java.lang.Long (null when the text has no tokens). */
  def compute(text: UTF8String): java.lang.Long = {
    val hashes = TextShingles.tokenHashes(text)
    if (hashes.isEmpty) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      // fmix for bit-uniformity: raw FNV low bits are weakly avalanched
      val h = TextShingles.fmix64(hashes(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
}

object TextShingles {

  def column(text: Column): Column =
    ExpressionUtils.column(TextShingles(ExpressionUtils.expression(text)))

  private final val FnvBasis = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Phi = 0x9E3779B97F4A7C15L

  private[graftx] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** Sorted DISTINCT FNV-1a hashes of the letter-run tokens (same
    * tokenizer as [[compute]], shared by the SimHash expression).
    */
  private[graftx] def tokenHashes(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    var out = new Array[Long](16)
    var nOut = 0
    var tokenH = FnvBasis
    var inToken = false
    var i = 0
    val n = bytes.length
    while (i <= n) {
      val c: Int = if (i < n) bytes(i) & 0xff else 0
      val lower =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') c + 32
        else -1
      if (lower >= 0) {
        if (!inToken) { inToken = true; tokenH = FnvBasis }
        tokenH = (tokenH ^ lower) * FnvPrime
      } else if (inToken) {
        inToken = false
        if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
        out(nOut) = tokenH
        nOut += 1
      }
      i += 1
    }
    if (nOut == 0) return Array.emptyLongArray
    java.util.Arrays.sort(out, 0, nOut)
    var w = 1
    var r = 1
    while (r < nOut) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** One pass: token runs -> FNV token hashes -> rolling 3-window mix
    * -> sort -> dedupe. Returns an UnsafeArrayData of longs.
    */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var out = new Array[Long](16)
    var nOut = 0
    // rolling window of the last 3 token hashes
    var h1 = 0L; var h2 = 0L; var h3 = 0L
    var nTokens = 0
    var tokenH = FnvBasis
    var inToken = false
    var i = 0
    val n = bytes.length
    while (i <= n) {
      val c: Int = if (i < n) bytes(i) & 0xff else 0
      val lower =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') c + 32
        else -1
      if (lower >= 0) {
        if (!inToken) { inToken = true; tokenH = FnvBasis }
        tokenH = (tokenH ^ lower) * FnvPrime
      } else if (inToken) {
        inToken = false
        h1 = h2; h2 = h3; h3 = tokenH
        nTokens += 1
        if (nTokens >= 3) {
          var h = h1
          h = h * Phi + h2
          h = h * Phi + h3
          if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
          out(nOut) = fmix64(h)
          nOut += 1
        }
      }
      i += 1
    }
    if (nOut == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    java.util.Arrays.sort(out, 0, nOut)
    // in-place dedupe of the sorted prefix
    var w = 1
    var r = 1
    while (r < nOut) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }
}
