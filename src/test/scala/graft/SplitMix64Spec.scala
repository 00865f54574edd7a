package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.SplitMix64

/** SplitMix64 finalizer — the ANN sample gate's hash. Pinned against
  * reference values computed independently (python, 64-bit wrapping
  * arithmetic), plus codegen/interpreted and column/driver agreement:
  * the DuckDB oracle replays this bit-for-bit, so the JVM
  * implementation must never drift.
  */
class SplitMix64Spec extends SparkSpec {

  import spark.implicits._

  // (input, signed output) — independently computed
  private val reference = Seq(
    0L -> -2152535657050944081L,
    1L -> -7995527694508729151L,
    2L -> -7541218347953203506L,
    499L -> -5146442163954522369L,
    4999L -> -2909587374122418208L)

  test("matches independently computed reference vectors") {
    reference.foreach { case (in, want) =>
      assert(SplitMix64.mix(in) == want, s"mix($in)")
    }
  }

  test("column path agrees with the driver implementation") {
    val ins = reference.map(_._1) ++
      Seq(Long.MaxValue, Long.MinValue, -1L, 123456789012345L)
    val got = ins.toDF("x")
      .select(SplitMix64.column(col("x")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ins.map(SplitMix64.mix),
      "codegen output diverges from the JVM reference")
  }

  test("pmod gate selects an id-structure-independent sample") {
    // the failure the hash exists to prevent: ids with arithmetic
    // structure (base + range * 1e7) must not collapse the sample
    // onto a few base vectors. 100 ranges x 500 base ids, mod 100:
    // the modulus gate picks the SAME 5 base ids from every range;
    // the hashed gate must cover far more of the base space.
    val ids = for (r <- 0 until 100; b <- 0 until 500)
      yield r * 10000000L + b
    val picked = ids.filter(i =>
      math.floorMod(SplitMix64.mix(i), 100L) == 0L)
    val distinctBases = picked.map(_ % 10000000L).distinct.size
    assert(picked.size > 300 && picked.size < 700,
      s"sample size ${picked.size} far from the expected ~500")
    assert(distinctBases > 200,
      s"only $distinctBases distinct base ids — structure leaked through")
  }
}
