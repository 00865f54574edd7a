package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PubMed article I/O: the reference's stage-2/3 data contracts as
  * declarative sources (SURVEY.md §1.4, O9-O12).
  *
  * NDJSON article shape (FIXTURES.md A1):
  * `{"pmid": 123456, "medent": {"abstract": "..."}}` one per line.
  */
object Articles {

  val schema: StructType = StructType(Seq(
    StructField("pmid", LongType),
    StructField("medent", StructType(Seq(
      StructField("abstract", StringType))))))

  /** NDJSON reader with the explicit article schema (no inference scan). */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Robust NDJSON reader for untrusted feeds: malformed lines don't
    * kill the job (PERMISSIVE) and don't silently vanish either — they
    * land in `_corrupt` for a quarantine sink. At 100 TB a single bad
    * page must cost one quarantined row, not a retried stage.
    */
  def readNdjsonRobust(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Split a robust read into (clean, quarantine). The parse is
    * cached first — Spark refuses corrupt-column-only queries over raw
    * JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and operationally both
    * halves are consumed anyway (clean onward, quarantine to a sink),
    * so one materialization serves both instead of two file scans.
    */
  def quarantine(robust: DataFrame): (DataFrame, DataFrame) = {
    val cached = robust.cache()
    (cached.where(col("_corrupt").isNull).drop("_corrupt"),
      cached.where(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw_line")))
  }

  /** (pmid, abstract) projection, dropping abstract-less articles —
    * O10+O12 (`asn1.get_abstracts` + has-abstract filter) as two
    * Catalyst operators.
    */
  def abstracts(articles: DataFrame): DataFrame =
    articles
      .select(col("pmid"), col("medent.abstract").as("abstract"))
      .where(col("abstract").isNotNull)

  /** Raw ASN.1 page files -> article rows. Whole-file read (one page
    * blob per file, reference naming {year}_{month}_num_{retstart}) then
    * a flatMap parse per file — the O9 `asn1.to_json` stage as a
    * source returning rows instead of a side-effecting upload. The
    * `year`/`month` columns are recovered from the file name (O21).
    */
  def readAsn1(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content").cast("string").as("body"))
    val parsed: Dataset[(String, Long, Option[String])] =
      files.as[(String, String)].flatMap { case (path, body) =>
        Asn1.articles(body).map(a => (path, a.pmid, a.abstractText))
      }
    parsed.toDF("path", "pmid", "abstract")
      .withColumn("fname", regexp_extract(col("path"), "([^/]+)$", 1))
      .select(
        col("pmid"),
        col("abstract"),
        substring(col("fname"), 1, 4).cast("int").as("year"),
        regexp_extract(col("fname"), "^\\d{4}_(\\d{1,2})_", 1)
          .cast("int").as("month"))
  }

  /** Write articles as partitioned NDJSON — the stage-2 sink (O24)
    * expressed declaratively with deterministic partition paths.
    */
  def writeNdjson(articles: DataFrame, outDir: String): Unit =
    articles.write.mode("overwrite").json(outDir)
}
