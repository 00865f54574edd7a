package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch — the mergeable
  * cardinality sketch family (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD 2007 "distinct sampling") that complements the engine's HLL
  * (approx_count_distinct) and CMS (heavy hitters): unlike HLL, a KMV
  * sketch supports SET ALGEBRA — union is "merge and keep the k
  * smallest", and intersection estimates fall out of the union sketch
  * via the Jaccard trick — so per-source sketches answer pairwise
  * corpus-overlap questions without ever joining the corpora.
  *
  * Estimator: with h uniform on [0, H) and h_k the k-th smallest
  * distinct hash of a set S, |S| ~= (k-1) * H / h_k; when |S| < k the
  * sketch holds ALL of S and the count is exact. Error ~ 1/sqrt(k).
  *
  * The hash is the cross-engine md5-prefix recipe (first 15 hex digits
  * = 60 uniform bits), so both registered queries are fully
  * hash-checked against DuckDB replaying the identical estimator —
  * sketch VALUES, not just shapes, match.
  *
  * Scale shape: one shuffle on (group, hash) with map-side partial
  * dedup builds the distinct-hash table; the sketch agg map-side
  * combines bounded k-buffers, so at most k+1 longs per (partition,
  * group) reach the final shuffle. Pairwise overlap then runs on
  * sketches alone — #groups rows of k longs, never corpus-sized.
  */
object KmvSketch {

  /** 2^60, the hash space size as an exact double. */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit uniform hash, identical in Spark and DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Bounded k-min buffer of DISTINCT hash values; input rows are
    * already distinct per group (the sketch build dedups first) but
    * the insert dedups anyway so merges are idempotent.
    */
  class KMinAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
      if (buf.length == k && buf.last <= v) buf
      else if (buf.contains(v)) buf
      else ((buf :+ v).sorted).take(k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group sketch over `valueCol`: (group, n_exact, mins) where
    * `mins` is the sorted k-min distinct-hash buffer and `n_exact` the
    * true distinct count (same shuffle — it rides the dedup the sketch
    * needs anyway, and lets callers report estimator quality).
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int): DataFrame = {
    val kmin = udaf(new KMinAgg(k), Encoders.scalaLong)
    df.select(col(groupCol), hash60(valueCol).as("hv"))
      .distinct()
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_exact"), kmin(col("hv")).as("mins"))
  }

  /** Distinct-count estimate from a sketch's `mins` column. */
  def estimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(mins, k).cast("double"))

  /** Persist per-group sketches: (group, mins) parquet. The whole
    * state is #groups x k longs — the operational win of a sketch
    * index: incremental distinct/overlap over a 100 TB corpus costs
    * one bounded-size merge per ingest batch, never a corpus re-scan.
    */
  def writeSketches(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int, dir: String): Unit =
    sketch(df, groupCol, valueCol, k)
      .select(col(groupCol), col("mins"))
      .write.mode("overwrite").parquet(dir)

  /** Fold a new batch into a persisted sketch table. K-min-of-union is
    * associative and commutative, so any batch chopping yields the
    * SAME state as a one-shot build over all data (StreamingKmvSpec
    * pins exact equality) — this is what makes the sketch safe to
    * maintain from foreachBatch on a stream. The merged state is
    * localCheckpoint-materialized before the overwrite so the read and
    * the write of `dir` never race.
    */
  def mergeInto(batch: DataFrame, groupCol: String, valueCol: Column,
      k: Int, dir: String): Unit = {
    val spark = batch.sparkSession
    val kmin = udaf(new KMinAgg(k), Encoders.scalaLong)
    val oldHv = spark.read.parquet(dir)
      .select(col(groupCol), explode(col("mins")).as("hv"))
    val newHv = batch.select(col(groupCol), hash60(valueCol).as("hv"))
    val merged = oldHv.union(newHv).distinct()
      .groupBy(groupCol).agg(kmin(col("hv")).as("mins"))
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(dir)
  }

  /** Pairwise overlap between all group sketches: union two sketches
    * (merge, keep k smallest), estimate the union size, estimate
    * Jaccard as the fraction of the union sketch present in BOTH
    * inputs, and multiply out the intersection. Pure array built-ins
    * over #groups^2/2 sketch rows — the corpora are never touched.
    * Output: (src_a, src_b, jaccard_est, inter_est).
    */
  def overlap(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("src_a"), col("mins").as("la"))
    val b = sketches.select(col(groupCol).as("src_b"), col("mins").as("lb"))
    val uni = slice(array_sort(array_union(col("la"), col("lb"))), 1, k)
    val kp = size(col("uni"))
    val unionEst = when(kp < k, kp.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(col("uni"), k).cast("double"))
    val jac = size(array_intersect(col("uni"),
      array_intersect(col("la"), col("lb")))).cast("double") / kp
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("uni", uni)
      .select(col("src_a"), col("src_b"),
        round(jac, 4).as("jaccard_est"),
        round(jac * unionEst, 4).as("inter_est"))
  }
}
