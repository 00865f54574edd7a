package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for the mid-size-dimension join.
  *
  * The gap this fills at 100 TB: a dim small enough to broadcast gets
  * a broadcast hash join (no fact shuffle); a dim too big for that
  * forces a sort-merge join that shuffles the ENTIRE fact table — even
  * when only a sliver of fact rows have a partner. A Bloom filter over
  * the dim keys costs ~1.2 bytes/key at 1% fpp, so a 100M-key dim fits
  * in ~120 MB — broadcastable even when the dim rows are not. Filtering
  * the fact BEFORE the shuffle cuts shuffle volume to (selectivity +
  * fpp) of the fact.
  *
  * Correctness: Bloom filters have no false negatives, so the
  * prefilter never drops a matching row; false positives are removed
  * by the join itself. The result is bit-identical to the plain join —
  * which is exactly what the DuckDB oracle checks.
  *
  * Spark's own AQE injects bloom runtime filters in some shapes
  * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
  * the explicit form for when the optimizer can't see the opportunity
  * (e.g. the dim is the output of an arbitrary subplan, or the join is
  * performed in a later job against a persisted fact).
  */
object BloomPrune {

  /** Inner-join `fact` to `dim` with a Bloom prefilter on the fact
    * side. `expectedDimKeys` sizes the filter; `fpp` trades filter
    * size against wasted shuffle (false-positive fact rows that
    * shuffle but match nothing).
    */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame =
    prefilter(fact, dim, factKey, dimKey, expectedDimKeys, fpp)
      .join(dim, col(factKey) === col(dimKey))

  /** The prefilter alone (semi-join-shaped), for pipelines that stage
    * the pruned fact before several downstream joins.
    *
    * Build and probe go through the SAME representation — xxhash64 of
    * the key column — on both sides, so the no-false-negative contract
    * holds for ANY key type (string, decimal, struct...), not just
    * integral ones. An xxhash64 collision between a fact key and some
    * dim key only adds a false positive, which the join removes.
    */
  def prefilter(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    // Two-job build (dim scan + fact join) — the dim aggregate is tiny
    // next to the fact shuffle it eliminates. sc.broadcast ships the
    // filter once per executor, not per task closure.
    val bloom = dim.select(xxhash64(col(dimKey)).as("__k"))
      .stat.bloomFilter("__k", expectedDimKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    fact.where(mightContain(xxhash64(col(factKey))))
  }
}
