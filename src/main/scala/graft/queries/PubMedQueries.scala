package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The custom `pubmed` DSv2 source exercised BY THE CORRECTNESS GATE,
  * not only by specs: page blobs are derived deterministically from the
  * `documents` table, land through the source's own two-phase-commit
  * WRITE path (reference object naming `{year}_{month}_num_{retstart}`),
  * and the registered query reads them back with
  * `spark.read.format("pubmed")` — year pushdown pruning the planned
  * (year, month) partitions at the SOURCE (1991..1993 plans 36 monthly
  * fetch partitions, never 48; pinned in PubMedSourceSpec) — then
  * aggregates pages per month. The DuckDB oracle replays the same
  * derivation arithmetic straight off `documents`, so a hash match
  * proves write naming, read transport, pushdown and column pruning
  * are all result-invisible.
  */
object PubMedQueries {

  /** Deterministic doc -> page derivation (both engines state it):
    * year 1990 + doc_id%4, month 1 + doc_id%12, retstart = doc_id
    * (unique, so overwrite-by-name is idempotent), content = text.
    */
  private def pageBlobs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      (lit(1990) + pmod(col("doc_id"), lit(4))).cast("int").as("year"),
      (lit(1) + pmod(col("doc_id"), lit(12))).cast("int").as("month"),
      col("doc_id").as("retstart"),
      col("text").as("content"))

  /** Build-once page-blob dir per dataset path (bm25IndexTopK's cache
    * discipline: full sanitized path key + completion marker written
    * only after the DSv2 commit finishes).
    */
  private[queries] def pagesDir(spark: SparkSession, dir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_pubmed_pages_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new java.io.File(s"$out/_GRAFT_PAGES_COMPLETE")
    if (!marker.exists()) {
      pageBlobs(spark, dir)
        .write.format("pubmed").option("path", out).mode("append").save()
      marker.createNewFile()
    }
    out
  }

  def pubmedPageStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("pubmed")
      .option("path", pagesDir(spark, dir))
      .option("beginYear", 1990).option("endYear", 1994)
      .load()
      .where(col("year") >= 1991) // pushed: prunes 1990's 12 partitions
      .groupBy(col("year").cast("long").as("year"),
        col("month").cast("long").as("month"))
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("content"))).cast("long").as("content_chars"),
        max("retstart").as("max_retstart"))
      .orderBy("year", "month")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pubmed_page_stats" -> pubmedPageStats)

  val oracle: Map[String, String] = Map(
    "pubmed_page_stats" ->
      """SELECT CAST(1990 + doc_id % 4 AS BIGINT) AS year,
  CAST(1 + doc_id % 12 AS BIGINT) AS month,
  count(*) AS n_pages,
  CAST(sum(length(text)) AS BIGINT) AS content_chars,
  max(doc_id) AS max_retstart
FROM documents WHERE 1990 + doc_id % 4 >= 1991
GROUP BY 1, 2 ORDER BY year, month""")
}
