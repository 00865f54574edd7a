package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative sinks + incremental recompute, replacing the reference's
  * per-element upload closures (SURVEY.md §2.1 O3, O22-O24):
  *
  *  - partitioned parquet/csv writes with deterministic partition paths
  *    (idempotent re-run = overwrite of the same paths, the property the
  *    reference got from exists-check skipping);
  *  - output fan-out control via repartition (the reference's manual
  *    5-chunk split, word_count.py:85-94);
  *  - pending-work anti-join: compute what's NOT yet in the sink in one
  *    distributed join instead of one remote existence probe per object
  *    (job_pubmed_submit.py:40-43 did N HTTP HEADs).
  */
object Sinks {

  /** Write partitioned by year (reference naming partitioned the object
    * path by (year, month), job_pubmed_submit.py:40). `chunks` bounds
    * files per partition — the declarative form of O22's chunking.
    */
  def writePartitioned(df: DataFrame, outDir: String,
      partitionCols: Seq[String], chunks: Int = 1,
      format: String = "parquet"): Unit =
    df.repartition(chunks, partitionCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .format(format)
      .option("header", "false")
      .save(outDir)

  /** Header-less CSV, the reference's exact output contract (O23,
    * extract_kw...py:103).
    */
  def writeKeywordCsv(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(outDir)

  /** Upsert-by-partition: rewrite ONLY the partition directories the
    * batch touches (`partitionOverwriteMode=dynamic`), leaving every
    * other partition's files untouched. The parquet-only answer to
    * incremental loads at 100 TB — a static overwrite would truncate
    * the whole table, a blind append would duplicate reruns; dynamic
    * overwrite makes the retry idempotent at partition granularity.
    */
  def upsertPartitions(batch: DataFrame, outDir: String,
      partitionCols: Seq[String]): Unit =
    batch.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(outDir)

  /** Compact a parquet directory to ~`targetBytes` files: small-file
    * mitigation for sinks that accumulated per-micro-batch or
    * per-retry fragments. One pass: size the target file count from
    * the CURRENT on-disk bytes (compression-representative, no
    * guessing from row counts), rewrite via repartition, swap
    * directories only after the rewrite commits — readers never see a
    * partial state. At cluster scale run per partition directory so
    * the rewrite parallelism is bounded by a partition, not the table.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, (totalBytes / targetBytes).toInt +
      (if (totalBytes % targetBytes > 0) 1 else 0))
    val tmp = new org.apache.hadoop.fs.Path(dir + "._compact_tmp")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + "._compact_old")
    fs.delete(bak, true)
    require(fs.rename(path, bak), s"could not stage $dir")
    require(fs.rename(tmp, path), s"could not commit compaction of $dir")
    fs.delete(bak, true)
  }

  /** Rows of `pending` whose `keyCols` are not yet present in the sink —
    * one anti-join replaces per-object exists checks. Reading just the
    * key columns of the sink prunes everything else at the scan.
    */
  def notYetWritten(spark: SparkSession, pending: DataFrame,
      sinkPath: String, keyCols: Seq[String]): DataFrame = {
    val existing =
      try spark.read.parquet(sinkPath).select(keyCols.map(col): _*).distinct()
      catch {
        case _: Exception => // empty sink: everything is pending
          return pending
      }
    pending.join(existing, keyCols, "left_anti")
  }

  /** Versioned dataset snapshots — the training-corpus lifecycle the
    * operator docs reference ("a real deployment versions the index /
    * vocab by corpus snapshot"), without a table format dependency:
    *
    *  - every write lands a NEW immutable `v=N` directory (N =
    *    max existing + 1); nothing ever rewrites a published version,
    *    so a training run pinned to `readVersion(root, 7)` is
    *    reproducible forever regardless of later ingest;
    *  - a `_GRAFT_VERSION_COMPLETE` marker is written AFTER the
    *    parquet commit, and readers resolve versions only through
    *    markers — a crash mid-write leaves an invisible orphan
    *    directory, never a readable partial snapshot (the same
    *    marker-after-data discipline as the BM25/LSH index caches);
    *  - `readLatest` resolves the newest COMPLETE version at call
    *    time, so concurrent writers and readers never race.
    *
    * At 100 TB a snapshot write is one pass of whatever produced the
    * DataFrame; the version directory is the unit of retention
    * (drop old `v=N` dirs whole) and of compaction ([[compact]] on a
    * version dir before its marker lands).
    */
  def writeVersion(df: DataFrame, root: String): Long = {
    val dir = new java.io.File(root)
    dir.mkdirs()
    // number from ALL version dirs, complete or not: a crashed
    // writer's orphan must be skipped past, never collided with
    val next = listDirs(root).lastOption.map(_ + 1).getOrElse(1L)
    val vdir = s"$root/v=$next"
    df.write.mode("errorifexists").parquet(vdir)
    new java.io.File(s"$vdir/$VersionMarker").createNewFile()
    next
  }

  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(new java.io.File(s"$root/v=$v/$VersionMarker").exists(),
      s"version $v is absent or incomplete under $root")
    spark.read.parquet(s"$root/v=$v")
  }

  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val vs = listComplete(root)
    require(vs.nonEmpty, s"no complete versions under $root")
    spark.read.parquet(s"$root/v=${vs.last}")
  }

  def listComplete(root: String): Seq[Long] =
    listDirs(root, completeOnly = true)

  private def listDirs(root: String, completeOnly: Boolean = false): Seq[Long] = {
    val re = raw"v=(\d+)".r
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(n) if !completeOnly ||
            new java.io.File(f, VersionMarker).exists() => Some(n.toLong)
        case _ => None
      }).sorted.toSeq
  }

  private val VersionMarker = "_GRAFT_VERSION_COMPLETE"
}
