package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Pins the invariant `dedup_lsh_quality`'s r14 count fold stands on
  * (VERDICT r14 task 6): the full-outer-join aggregation counts
  * nExact/nLsh/nCommon correctly ONLY when both pair tables are
  * duplicate-free — a duplicate (ida, idb) row would silently multiply
  * the other side's count through the join. Both tables are distinct
  * by construction today (candidates are de-duplicated before the 1:1
  * verify fetch); this spec makes a future change that emits a
  * duplicate pair fail loudly instead of corrupting the recall readout.
  */
class LshQualityInvariantSpec extends SparkSpec {

  private def requireDistinct(df: DataFrame, what: String): Unit = {
    val n = df.count()
    val d = df.distinct().count()
    assert(n == d,
      s"$what emits duplicate pairs ($n rows, $d distinct) — the " +
        "dedup_lsh_quality full-outer count fold silently multiplies " +
        "counts on duplicated input; de-duplicate before the fold or " +
        "revert the query to the intersect formulation")
  }

  test("both memoized pair tables behind dedup_lsh_quality are distinct") {
    requireDistinct(
      DedupQueries.sharedPairs(spark, sfDir)
        .where(col("jaccard") >= 0.5).select("ida", "idb"),
      "the exact shingle-Jaccard pair graph (NearDupGraph.pairs)")
    requireDistinct(
      DedupQueries.sharedLshPairs(spark, sfDir).select("ida", "idb"),
      "the MinHash-LSH pair table (Dedup.minhashLshPairs)")
  }

  /** The fold formula itself: equal to the intersect formulation on
    * distinct inputs, and DIVERGENT the moment a duplicate pair is
    * injected — the red-on-injection demonstration the r14 verdict
    * asked for (it is exactly why the distinctness pin above guards
    * the production tables).
    */
  test("the count fold diverges on an injected duplicate pair") {
    import spark.implicits._
    def fold(exact: DataFrame, lsh: DataFrame): (Long, Long, Long) = {
      val r = exact.withColumn("_e", lit(1L))
        .join(lsh.withColumn("_l", lit(1L)), Seq("ida", "idb"),
          "full_outer")
        .agg(
          coalesce(sum("_e"), lit(0L)),
          coalesce(sum("_l"), lit(0L)),
          coalesce(count(when(col("_e").isNotNull && col("_l").isNotNull,
            lit(1))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val exact = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("ida", "idb")
    val lsh = Seq((1L, 2L), (5L, 6L), (7L, 8L)).toDF("ida", "idb")
    // distinct inputs: fold == the intersect formulation
    assert(fold(exact, lsh) ==
      (exact.count(), lsh.count(),
        exact.intersect(lsh).count()))
    // one duplicated lsh pair: the join multiplies the exact side —
    // the fold is WRONG from that moment on, which is what the
    // distinctness pin exists to catch before it can happen silently
    val dupLsh = lsh.unionAll(Seq((1L, 2L)).toDF("ida", "idb"))
    val (nE, nL, nC) = fold(exact, dupLsh)
    assert(nE != exact.count() || nC != exact.intersect(dupLsh).count(),
      "expected the fold to diverge on duplicated input — if it no " +
        "longer does, the fold was made duplicate-safe and this spec " +
        "plus the distinctness pin can be retired together")
  }
}
