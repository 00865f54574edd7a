package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.InterleaveBits

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping.
  *
  * A 100 TB fact table queried by EITHER of two keys can only serve
  * one of them from a linear sort order; files sorted by `x` carry
  * full-range min/max stats on `y`, so `y` predicates scan everything.
  * Interleaving the key bits and range-partitioning by the z-value
  * gives every output file a tight bounding box in (x, y): parquet
  * min/max file and row-group skipping then prunes on both columns.
  *
  * This is layout work, not a new execution operator — the write path
  * is plain `repartitionByRange` + `sortWithinPartitions` + parquet,
  * so Catalyst/Tungsten treat it like any other sort, and the read
  * path needs nothing graft-specific at all (stock parquet stats
  * pruning). Modeled on the public Delta Lake OPTIMIZE ZORDER BY and
  * Hudi clustering designs.
  */
object ZOrder {

  /** 64-bit z-value of two long columns (low 32 bits each). */
  def zvalue(x: Column, y: Column): Column = InterleaveBits.column(x, y)

  /** Cluster `df` into `numFiles` files z-ordered on (x, y).
    *
    * Raw interleave is useless when the key ranges differ: the wider
    * key's high bits sit above every bit of the narrow key, so the
    * z-sort degenerates to a single-column sort. Each dimension is
    * therefore min/max-normalized to 16 bits first (one tiny stats
    * aggregate), putting both on equal footing in the curve — the same
    * reason Delta's OPTIMIZE ZORDER BY ranks columns before
    * interleaving. For heavily skewed value distributions, substitute
    * a quantile rank for the linear scaling; the interleave is
    * unchanged.
    *
    * `repartitionByRange` samples the z distribution, so files are
    * balanced even when the keys are skewed — a static modulus split
    * would not be. The sort inside each partition keeps row groups
    * within a file tight too (row-group-level skipping).
    */
  def cluster(df: DataFrame, x: String, y: String, numFiles: Int): DataFrame = {
    val s = df.agg(
      min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double")).head()
    def norm16(c: Column, lo: Double, hi: Double): Column =
      ((c.cast("double") - lit(lo)) * lit(65535.0) /
        lit(math.max(hi - lo, 1.0))).cast("long")
    val z = zvalue(
      norm16(col(x), s.getDouble(0), s.getDouble(1)),
      norm16(col(y), s.getDouble(2), s.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Cluster and write as parquet; returns nothing — read the dir back
    * to query with both-dimension pruning.
    */
  def clusterWrite(df: DataFrame, x: String, y: String, numFiles: Int,
      path: String): Unit =
    cluster(df, x, y, numFiles).write.mode("overwrite").parquet(path)
}
