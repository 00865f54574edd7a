package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.KeywordPipeline

/** Reference-parity keyword pipeline registered for the driver dump.
  * Lemmatization/POS are dictionary-backed Scala UDFs with no ANSI-SQL
  * equivalent, so these get rows-only driver checks; exact behavior is
  * pinned by KeywordPipelineSpec (golden README output).
  */
object PipelineQueries {

  /** v2 POS-aware lemmatized keyword frequency over the corpus. */
  def keywordsV2TopK(spark: SparkSession, dir: String): DataFrame =
    KeywordPipeline.keywordTableV2(
        Tables(spark, dir, "documents"), "doc_id", "text", lit(2024))
      .groupBy("keyword")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("keyword"))
      .limit(100)

  /** The reference's golden example (README.md:4-17) end-to-end as a
    * query: the v1 inverted index of the golden abstract. Expected: 7
    * rows (article/review/different/publication/breast/cancer/man).
    */
  def pubmedGoldenV1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      (123456L, "This article is a review of the different publications " +
        "on breast cancer in men.")).toDF("pmid", "abstract")
    KeywordPipeline.invertedIndexV1(docs, "pmid", "abstract")
      .orderBy("word")
  }

  /** The full training-data preparation funnel over the corpus. */
  def corpusFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.funnel(Tables(spark, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_keywords_v2_topk" -> keywordsV2TopK,
    "pipeline_pubmed_golden_v1" -> pubmedGoldenV1,
    "pipeline_corpus_funnel" -> corpusFunnel)

  val oracle: Map[String, String] = Map.empty
}
