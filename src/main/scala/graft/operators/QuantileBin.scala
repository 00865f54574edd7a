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
    val spark = df.sparkSession
    val ord = col(valueCol) +: tieCols.map(col)
    val bucketed = df.withColumn("_qb",
      floor(col(valueCol).cast("double") / lit(bucketWidth)).cast("long"))
    // ONE bounded action serves offsets AND the total: the bucket table
    // is ~n/bucketWidth rows by construction, so collect it (the same
    // driver budget BoundedPrefix spends), scan for the exclusive
    // prefix sums, and fold n/base/rem into LITERALS — no checkpoint
    // job, no second total aggregation, no crossJoin broadcast.
    // null values bucket to a null _qb: those rows were dropped by the
    // offsets equi-join before AND after this fold, but the former
    // prefix-sum path sorted the null group FIRST (shifting every
    // non-null offset by its count) and the former total summed over
    // it — both reproduced exactly here.
    val allRows = bucketed.groupBy("_qb").agg(count(lit(1)).as("_c"))
      .collect()
    val nullCnt = allRows.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val rows = allRows.filterNot(_.isNullAt(0))
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = nullCnt
    val offRows = rows.map { case (b, c) =>
      val o = acc; acc += c; org.apache.spark.sql.Row(b, o)
    }
    val nTotal = acc
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_qb",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_off",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    // ntile(k): base = n div k rows per tile, the first n % k tiles
    // carry one extra; tile from rank is pure integer math (identical
    // to the former column arithmetic, with the scalars pre-folded)
    val base = nTotal / k
    val rem = nTotal % k
    val cut = rem * (base + 1)
    bucketed
      .join(broadcast(offsets), "_qb")
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_qb").orderBy(ord: _*)).cast("long"))
      .withColumn("_rank", col("_off") + col("_rn"))
      .withColumn(tileCol,
        when(col("_rank") <= lit(cut),
          expr(s"(_rank - 1) div ${base + 1}L") + 1)
          .otherwise(lit(rem) +
            expr(s"(_rank - ${cut}L - 1) div ${base}L") + 1))
      .drop("_qb", "_off", "_rn", "_rank")
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
