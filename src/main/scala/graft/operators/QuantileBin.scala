package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (quantile) binning — the feature-engineering /
  * stratification primitive that puts ~n/k rows in each of k bins.
  *
  * Scale posture (100 TB): the exact formulation is
  * `ntile(k) OVER (ORDER BY v)` — a GLOBAL sort through one reducer,
  * which is the canonical scale anti-pattern. [[equiDepth]] instead
  * computes cutpoints with `approx_percentile` (a mergeable KLL-style
  * sketch: one map-side pass, tiny merge at the driver) and assigns
  * bins with a codegen'd comparison chain against the k-1 literal
  * cutpoints. No shuffle at all beyond the sketch's partial-merge —
  * binning a 100 TB column is a single scan.
  *
  * The registered `stats_quantile_bins` query keeps the exact ntile
  * form at harness scale so DuckDB can pin it; QuantileBinSpec pins the
  * approx path against it (bin populations within the sketch's error
  * bound, boundaries order-consistent).
  */
object QuantileBin {

  /** Returns the k-1 interior cutpoints of the value column. */
  def cutpoints(df: DataFrame, valueCol: String, nBins: Int,
      relErr: Double = 0.001): Array[Double] = {
    val probs = (1 until nBins).map(_.toDouble / nBins)
    df.select(percentile_approx(col(valueCol).cast("double"),
        array(probs.map(lit): _*),
        lit((1.0 / relErr).toInt)).as("q"))
      .collect()(0).getSeq[Double](0).toArray
  }

  /** EXACT ntile(k) over a total order, computed distributed: rows
    * bucket by value range (`floor(value / bucketWidth)` — bucket order
    * IS value order), per-bucket counts aggregate map-side, the tiny
    * bucket table's offsets come from [[BoundedPrefix]] (driver scan —
    * no partition-less WindowExec stage), the per-row rank is offset +
    * within-bucket row_number (partitioned window), and the tile from
    * the rank is row-local integer math replicating SQL ntile's
    * first-tiles-carry-the-remainder contract. Bit-identical to
    * `ntile(k) OVER (ORDER BY value, ties...)` when the (value, tieCols)
    * order is total — with NO corpus-wide single-reducer sort.
    */
  def exactNtile(df: DataFrame, k: Int, valueCol: String,
      bucketWidth: Double, tieCols: Seq[String],
      tileCol: String = "tile"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = col(valueCol) +: tieCols.map(col)
    val bucketed = df.withColumn("_qb",
      floor(col(valueCol).cast("double") / lit(bucketWidth)).cast("long"))
    val counts = bucketed.groupBy("_qb").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true) // offsets + total share one counting scan
    val offsets = BoundedPrefix.offsets(
      counts, Nil, Seq("_qb"), Seq("_c" -> "_off"))
      .select("_qb", "_off")
    val total = counts.agg(sum("_c").as("_n_total"))
    bucketed
      .join(broadcast(offsets), "_qb")
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_qb").orderBy(ord: _*)).cast("long"))
      .withColumn("_rank", col("_off") + col("_rn"))
      .crossJoin(broadcast(total))
      // ntile(k): base = n div k rows per tile, the first n % k tiles
      // carry one extra; tile from rank is pure integer math
      .withColumn("_base", expr(s"_n_total div $k"))
      .withColumn("_rem", expr(s"_n_total % $k"))
      .withColumn("_cut", col("_rem") * (col("_base") + 1))
      .withColumn(tileCol,
        when(col("_rank") <= col("_cut"),
          expr("(_rank - 1) div (_base + 1)") + 1)
          .otherwise(col("_rem") + expr("(_rank - _cut - 1) div _base") + 1))
      .drop("_qb", "_off", "_rn", "_rank", "_n_total", "_base", "_rem", "_cut")
  }

  /** Adds `binCol` (0-based) assigning each row to its equi-depth bin
    * via a codegen'd when-chain over the broadcast-free literal
    * cutpoints.
    */
  def equiDepth(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String = "bin", relErr: Double = 0.001): DataFrame = {
    val cuts = cutpoints(df, valueCol, nBins, relErr)
    val v = col(valueCol).cast("double")
    val bin = cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((cut, i), rest) => when(v < cut, lit(i)).otherwise(rest)
    }
    df.withColumn(binCol, bin.cast("int"))
  }
}
