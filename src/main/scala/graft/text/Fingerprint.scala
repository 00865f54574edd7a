package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Document fingerprinting by winnowing (the public MOSS algorithm:
  * Schleimer, Wilkerson, Aiken, SIGMOD 2003): polynomial rolling hashes
  * of k-grams, keeping the rightmost minimum of each sliding window.
  * Guarantees any shared substring of length >= k + w - 1 produces at
  * least one shared fingerprint — the basis for copy detection at
  * corpus scale (explode fingerprints -> equi-join, never pairwise).
  */
object Fingerprint {

  private val Base = 257L
  private val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** Winnowed fingerprint set of the normalized text. */
  def winnow(text: String, k: Int = 7, w: Int = 4): Seq[Long] = {
    val s = if (text == null) "" else
      text.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (s.length < k) Seq.empty
    else {
      // rolling k-gram hashes; outgoing char carries weight Base^k
      // AFTER the multiply-add step (caught by the GraftProps winnowing
      // guarantee property: Base^(k-1) made hashes offset-dependent)
      var pow = 1L
      (0 until k).foreach(_ => pow = mulmod(pow, Base))
      var h = 0L
      val hashes = new Array[Long](s.length - k + 1)
      s.indices.foreach { i =>
        h = (mulmod(h, Base) + s.charAt(i)) % Mod
        if (i >= k) h = (h - mulmod(s.charAt(i - k).toLong, pow) % Mod + Mod) % Mod
        if (i >= k - 1) hashes(i - k + 1) = h
      }
      // winnow: rightmost min per window of w consecutive k-gram hashes
      val picked = Vector.newBuilder[Long]
      var last = -1
      var start = 0
      while (start + w <= hashes.length) {
        var mi = start
        var j = start
        while (j < start + w) { if (hashes(j) <= hashes(mi)) mi = j; j += 1 }
        if (mi != last) { picked += hashes(mi); last = mi }
        start += 1
      }
      val out = picked.result().distinct
      if (out.nonEmpty) out else Seq(hashes.min)
    }
  }

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit modular multiply via Math.multiplyHigh (no overflow)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val res = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    if (res >= Mod) res - Mod else res
  }

  /** Column path runs the native codegen expression
    * [[org.apache.spark.sql.graftx.TextWinnow]] (byte-level normalize +
    * roll, no String/Seq serde); `winnow` above stays as the reference
    * implementation the GraftProps equivalence property pins it to.
    */
  def fingerprints(text: Column): Column =
    org.apache.spark.sql.graftx.TextWinnow.column(text)
}
