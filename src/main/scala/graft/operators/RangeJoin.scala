package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval join: point-in-range joins WITHOUT an equi key.
  *
  * Spark plans a pure range predicate as a (broadcast) nested-loop
  * join — O(|points| x |intervals|) comparisons, a non-starter when
  * both sides are large. Binning manufactures the missing equi key:
  * each interval registers in every fixed-width bin it overlaps, each
  * point hashes to exactly one bin, and the join becomes a shuffled
  * equi join on the bin id followed by the residual range filter.
  * Each true pair is produced exactly once (the point's bin is
  * unique), so no dedup pass is needed.
  *
  * Cost model: interval side inflates by avg_interval_width/binWidth
  * rows; per-bin work is points_in_bin x intervals_touching_bin. Pick
  * binWidth ~ the typical interval width — same trade the public
  * Databricks range-join binning and the ST bin joins in Sedona make.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where
    * `points(pointCol) BETWEEN intervals(loCol) AND intervals(hiCol)`.
    * All columns of both inputs survive; `_bin` is internal.
    */
  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val binned = intervals.withColumn("_bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    val keyed = points.withColumn("_bin", binOf(col(pointCol)))
    keyed.join(binned,
        keyed("_bin") === binned("_bin") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval-INTERVAL overlap join: pairs where
    * `[loL, hiL]` and `[loR, hiR]` intersect (closed bounds). Both
    * sides register in every bin they overlap; a candidate pair shows
    * up once per SHARED bin, so instead of a distinct pass (an extra
    * corpus-sized shuffle) each pair is emitted only from its FIRST
    * shared bin — `bin == max(floor(loL/w), floor(loR/w))` — which
    * the overlap predicate guarantees both sides registered. Exactly-
    * once output with zero dedup cost; the join stays a shuffled hash
    * join on the bin id.
    */
  def binnedOverlapJoin(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val lb = left.withColumn("_binl",
      explode(sequence(binOf(col(loL)), binOf(col(hiL)))))
    val rb = right.withColumn("_binr",
      explode(sequence(binOf(col(loR)), binOf(col(hiR)))))
    lb.join(rb,
        col("_binl") === col("_binr") &&
          col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
          col("_binl") === greatest(binOf(col(loL)), binOf(col(loR))))
      .drop("_binl", "_binr")
  }
}
