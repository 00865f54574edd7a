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

  // ---- per-file Bloom index (point-lookup skipping) ----------------

  /** Per-file Bloom aggregation buffer — the public
    * `org.apache.spark.util.sketch.BloomFilter` wrapped in a typed
    * Aggregator so ALL files' filters build in ONE scan (a
    * `df.stat.bloomFilter` per file would be one job per file — wrong
    * shape at lake scale). Java-serialization encoder for the buffer:
    * the sketch is Serializable by contract and partials are
    * per-partition, not per-row.
    */
  private class BloomAgg(expectedItems: Long, fpp: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long), org.apache.spark.util.sketch.BloomFilter,
        Array[Byte]] {
    import org.apache.spark.util.sketch.BloomFilter
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, x: (String, Long)): BloomFilter = {
      b.putLong(x._2); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      a.mergeInPlace(b)
    override def finish(r: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      r.writeTo(out)
      out.toByteArray
    }
    override def bufferEncoder
        : org.apache.spark.sql.Encoder[BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
    override def outputEncoder
        : org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Point-lookup complement to the min/max zone maps: per-file Bloom
    * filters of a long key column, built in ONE scan grouped by
    * `input_file_name()`. Zone maps prune RANGES on clustered layouts;
    * a Bloom prunes EQUALITY probes on high-cardinality keys even when
    * the layout is uncorrelated with the key (the Delta/Iceberg
    * bloom-index feature). Index size: #files rows x ~(1.2 bytes per
    * expected item at 1% fpp).
    */
  def writeBloomIndex(spark: SparkSession, dataDir: String, keyCol: String,
      indexDir: String, expectedItemsPerFile: Long = 100000L,
      fpp: Double = 0.01): Unit = {
    import spark.implicits._
    val agg = new BloomAgg(expectedItemsPerFile, fpp)
    spark.read.parquet(dataDir)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("k"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("bloom"))
      .toDF("file", "bloom")
      .coalesce(1).write.mode("overwrite").parquet(indexDir)
  }

  /** Files whose Bloom filter might contain `key` (definitely-absent
    * files are skipped — no false negatives by the sketch contract).
    */
  private def bloomSurviving(spark: SparkSession, indexDir: String,
      key: Long): Seq[String] =
    spark.read.parquet(indexDir).select("file", "bloom").collect()
      .filter { r =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        bf.mightContainLong(key)
      }
      .map(_.getString(0)).toSeq

  /** Equality probe through the Bloom index: open only might-contain
    * files, then apply the exact predicate. Result == full scan +
    * filter; I/O == surviving files (expected 1 + fpp x others for a
    * key living in one file; ~zero for absent keys).
    */
  def bloomPrunedRead(spark: SparkSession, dataDir: String,
      indexDir: String, keyCol: String, key: Long): DataFrame = {
    val files = bloomSurviving(spark, indexDir, key)
    val full = spark.read.parquet(dataDir)
    if (files.isEmpty) full.where(lit(false))
    else spark.read.schema(full.schema).parquet(files: _*)
      .where(col(keyCol) === lit(key))
  }

  /** (files opened, total files) for an equality probe. */
  def bloomPruneStats(spark: SparkSession, indexDir: String,
      key: Long): (Int, Int) = {
    val total = spark.read.parquet(indexDir).count().toInt
    (bloomSurviving(spark, indexDir, key).size, total)
  }
}
