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
}
