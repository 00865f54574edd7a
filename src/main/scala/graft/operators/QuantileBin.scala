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
