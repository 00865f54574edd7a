package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max stats index for data skipping — the lakehouse
  * pattern (Delta/Iceberg file stats, Snowflake zone maps) that makes
  * [[ZOrder]] clustering actually pay off at read time: after
  * `ZOrder.clusterWrite` lays correlated dimensions out into disjoint
  * files, a range predicate touches only the files whose [min, max]
  * interval intersects it — the others are never opened (parquet's own
  * row-group skipping still needs every footer read; the index prunes
  * at the FILE level from one tiny table).
  *
  * The stats build is one aggregation over the data grouped by
  * `input_file_name()` — per-file min/max of the indexed columns. The
  * index is #files rows; collecting the surviving file list to the
  * driver is exactly what every table-format planner does (file
  * listings are driver-sized by design).
  *
  * Scale shape: stats build is partial+final agg (one scan, once per
  * write); each query reads the index (tiny), prunes, and scans only
  * surviving files. FileSkipIndexSpec pins both halves: pruned reads
  * return exactly the full-scan filter result, and the file count
  * actually drops on clustered layouts.
  */
object FileSkipIndex {

  /** Per-file [min, max] of each indexed column. */
  def buildStats(spark: SparkSession, dataDir: String,
      cols: Seq[String]): DataFrame =
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(cols.head)).as(s"min_${cols.head}"),
        (max(col(cols.head)).as(s"max_${cols.head}") +:
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)

  /** Build and persist the index next to the data. */
  def writeIndex(spark: SparkSession, dataDir: String,
      cols: Seq[String], indexDir: String): Unit =
    buildStats(spark, dataDir, cols)
      .coalesce(1).write.mode("overwrite").parquet(indexDir)

  /** Files whose [min, max] interval intersects [lo, hi] on `c`.
    * Null-stat files (all-null column) are kept — skipping them would
    * silently drop rows a null-tolerant predicate could match.
    */
  private def surviving(spark: SparkSession, indexDir: String,
      c: String, lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(indexDir)
      .where(col(s"min_$c").isNull ||
        !(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range query through the index: scan only intersecting files, then
    * apply the exact predicate. Result == full scan + filter; I/O ==
    * surviving files only.
    */
  def prunedRead(spark: SparkSession, dataDir: String, indexDir: String,
      c: String, lo: Any, hi: Any): DataFrame = {
    val files = surviving(spark, indexDir, c, lo, hi)
    val full = spark.read.parquet(dataDir)
    if (files.isEmpty) full.where(lit(false))
    else spark.read.schema(full.schema).parquet(files: _*)
      .where(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  /** How many files a [lo, hi] range on `c` would touch vs the total —
    * the skipping diagnostic.
    */
  def pruneStats(spark: SparkSession, indexDir: String,
      c: String, lo: Any, hi: Any): (Int, Int) = {
    val total = spark.read.parquet(indexDir).count().toInt
    (surviving(spark, indexDir, c, lo, hi).size, total)
  }
}
