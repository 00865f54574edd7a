package graft

import org.apache.spark.sql.functions._

import graft.pipeline.KeywordPipeline
import graft.sources.Articles

/** DSv2 PubMed source: month partitioning, reference file naming, and
  * the full ingest -> parse -> keyword flow end to end.
  */
class PubMedSourceSpec extends SparkSpec {

  private val fixtureDir =
    new java.io.File(getClass.getResource("/pubmed/1999_1_num_0").getPath)
      .getParent

  private def readSource =
    spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999")
      .option("endYear", "2000")
      .load()

  test("pubmed source plans one partition per month and reads pages") {
    val df = readSource
    assert(df.rdd.getNumPartitions == 12) // 1999 x 12 months
    val rows = df.collect()
    assert(rows.length == 1) // fixture has one page: 1999_1_num_0
    val r = rows.head
    assert(r.getInt(0) == 1999 && r.getInt(1) == 1 && r.getLong(2) == 0L)
    assert(r.getString(3).contains("Pubmed-entry"))
  }

  test("end year is exclusive (reference CLI contract)") {
    val df = spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999").option("endYear", "1999")
      .load()
    assert(df.count() == 0)
  }

  test("ingest -> asn1 parse -> keywords reproduces the golden output") {
    import spark.implicits._
    val pages = readSource.select(col("content")).as[String]
    val articles = pages.flatMap(graft.sources.Asn1.articles(_))
      .toDF("pmid", "abstract")
      .where(col("abstract").isNotNull)
    val words = KeywordPipeline.invertedIndexV1(articles, "pmid", "abstract")
      .where(col("pmid") === 123456L)
      .collect().map(_.getString(0)).toSet
    assert(words == Set("article", "review", "different", "publication",
      "breast", "cancer", "man"))
  }

  test("asn1 file source joins with ndjson output consistently") {
    val fromAsn1 = Articles.readAsn1(spark, s"$fixtureDir/1999_1_num_0")
    assert(fromAsn1.where(col("abstract").isNotNull).count() == 2)
  }
}
