package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement (Efraimidis &
  * Spirakis A-Res): each row gets priority u^(1/w) with u a uniform
  * derived from the 52-bit md5("w<seed>" || id) recipe below — the n
  * largest priorities ARE a weighted sample.
  *
  * Scale shape: one narrow projection + a bounded top-n
  * (TakeOrderedAndProject — per-partition heaps of n, no global sort,
  * no shuffle of the data itself). Determinism comes from hashing a
  * key column instead of RNG state, so task retries and re-runs pick
  * the SAME sample — the property corpus reproducibility needs and
  * `df.sample` does not give across partition changes.
  */
object WeightedSample {

  /** Uniform(0,1) from a hash: strictly inside (0,1) so log/pow are
    * finite. The hash is 13 hex digits of md5("w<seed>" || id) — 52
    * bits, so the integer→double conversion is EXACT and any engine
    * with md5 replays the identical uniform (the sample_uniform_k
    * md5-key recipe; DuckDB: ('0x' || substr(md5(...), 1, 13))::UBIGINT).
    * xxhash64 was the round-4 source; engine-specific, it kept this
    * operator rows-only at the driver.
    */
  private def uniform(id: Column, seed: Int): Column =
    (conv(substring(md5(concat(lit(s"w$seed"), id.cast("string"))), 1, 13),
      16, 10).cast("double") + lit(1.0)) /
      lit((1L << 52).toDouble + 2.0)

  /** Priority column: u^(1/w). Zero/negative weights sink to priority
    * 0 (never sampled ahead of any positive weight).
    */
  def priority(id: Column, weight: Column, seed: Int = 42): Column =
    when(weight > 0, pow(uniform(id, seed), lit(1.0) / weight))
      .otherwise(lit(0.0))

  /** n-row weighted sample without replacement, deterministic in
    * (idCol, seed).
    */
  def sample(df: DataFrame, idCol: String, weightCol: String, n: Int,
      seed: Int = 42): DataFrame =
    df.withColumn("_pri", priority(col(idCol), col(weightCol), seed))
      .orderBy(col("_pri").desc, col(idCol))
      .limit(n)
      .drop("_pri")
}
