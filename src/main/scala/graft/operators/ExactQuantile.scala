package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles by histogram bracketing (iterative
  * selection), NOT by `percentile()`'s value-map aggregation.
  *
  * Spark's exact `percentile` aggregate accumulates a per-partition
  * OpenHashMap of every distinct value — on a mostly-distinct 100 TB
  * column that is corpus-sized executor state and a corpus-sized merge.
  * Selection instead runs O(log_bins(range)) rounds of
  * (codegen'd bin-count groupBy over ≤8192 bins) to shrink a bracket
  * that provably contains the target order statistic, then sorts only
  * the final bracket (≤ bracketLimit rows) with TakeOrdered. Every
  * round ships 8192 longs to the driver; nothing else leaves the
  * executors. The two adjacent order statistics an interpolated
  * quantile needs come from ONE descent (a rank split across a bin
  * boundary resolves with two single-bin min/max aggregates).
  *
  * Interpolation matches Spark `percentile` / DuckDB `quantile_cont`:
  * pos = (n-1)·q, result = v⌊pos⌋ + (pos-⌊pos⌋)·(v⌈pos⌉ - v⌊pos⌋) over
  * 0-based order statistics — so results are bit-identical to both.
  */
object ExactQuantile {

  private val NBins = 8192

  /** Values at 0-based ranks k and (if wantPair) k+1, ascending. */
  private def orderStats(base: DataFrame, k: Long, n: Long,
      lo0: Double, hi0: Double, wantPair: Boolean,
      bracketLimit: Int): (Double, Double) = {
    var cur = base
    var curN = n
    var curLo = lo0
    var curHi = hi0
    var curK = k
    var depth = 0
    while (curN > bracketLimit && curHi > curLo && depth < 8) {
      val w = (curHi - curLo) / NBins
      // The FILTER for the next round reuses the exact floor expression
      // of the grouping, so fp wobble at bin edges cannot desynchronize
      // the rank bookkeeping.
      val binExpr: Column =
        greatest(least(floor((col("v") - lit(curLo)) / lit(w)),
          lit(NBins - 1)), lit(0)).cast("int")
      val counts = cur.groupBy(binExpr.as("b")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      var cum = 0L
      var target = -1
      var targetCnt = 0L
      for ((b, c) <- counts if target < 0) {
        if (cum + c > curK) { target = b; targetCnt = c } else cum += c
      }
      if (wantPair && cum + targetCnt == curK + 1) {
        // k is the LAST element of its bin: v[k] = max of this bin,
        // v[k+1] = min of the next non-empty bin — two tiny aggs, done.
        val vk = cur.where(binExpr === target)
          .agg(max("v")).collect()(0).getDouble(0)
        val nextB = counts.find { case (b, c) => b > target && c > 0 }.get._1
        val vk1 = cur.where(binExpr === nextB)
          .agg(min("v")).collect()(0).getDouble(0)
        return (vk, vk1)
      }
      cur = cur.where(binExpr === target)
      curK -= cum
      curN = targetCnt
      val nlo = curLo + target * w
      val nhi = curLo + (target + 1) * w
      curLo = nlo; curHi = math.min(nhi, curHi)
      depth += 1
    }
    // a collapsed bracket (curHi == curLo) can still hold DISTINCT
    // values a few ulps apart, so the final TakeOrdered always runs;
    // only the (pathological) >2B-row bracket of near-identical values
    // is rejected rather than silently overflowing the limit
    require(curK + 2 <= Int.MaxValue,
      s"quantile bracket holds ${curN} near-identical values; " +
        "raise bracketLimit or pre-round the column")
    val take = (curK + (if (wantPair) 2 else 1)).toInt
    val sorted = cur.orderBy("v").limit(take).collect().map(_.getDouble(0))
    val vk = sorted(curK.toInt)
    (vk, if (wantPair) sorted(curK.toInt + 1) else vk)
  }

  /** quantile_cont-style exact quantile of the value expression.
    *
    * `knownStats = Some((n, lo, hi))` skips the count/min/max pass when
    * the caller already knows the non-null row count exactly and a
    * CONSERVATIVE value range (lo <= true min, hi >= true max): the
    * histogram's bin expression clamps into [0, NBins-1], so a wider
    * bracket only coarsens the first descent round — every returned
    * order statistic is still the exact value. The canonical caller is
    * a derived-column quantile (MAD's median of |x - med|), whose count
    * equals the base column's and whose range is arithmetic on the base
    * column's min/max — one full pass of the data saved per call.
    */
  def quantile(df: DataFrame, value: Column, q: Double,
      bracketLimit: Int = 65536,
      knownStats: Option[(Long, Double, Double)] = None): Double = {
    val base = df.select(value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val (n, lo, hi) = knownStats.getOrElse {
      val r = base.agg(count(lit(1)), min("v"), max("v")).collect()(0)
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    require(n > 0, "quantile of an empty column")
    if (lo == hi) return lo
    val pos = (n - 1) * q
    val lowIdx = math.floor(pos).toLong
    val frac = pos - lowIdx
    val (vLow, vHigh) =
      orderStats(base, lowIdx, n, lo, hi, frac != 0.0, bracketLimit)
    // the exact two-sided weighted form Spark's Percentile (and DuckDB
    // quantile_cont) evaluate — NOT lo + frac*(hi-lo), which differs in
    // the last ulp
    if (frac == 0.0) vLow
    else (lowIdx + 1 - pos) * vLow + (pos - lowIdx) * vHigh
  }
}
