package graft

import org.apache.spark.sql.functions._

import graft.pipeline.KeywordPipeline
import graft.sources.{Articles, Asn1}
import graft.text.{Lemmatizer, PosTagger, Stopwords}

/** The reference's one behavioral spec: golden output for the README
  * abstract (spark-pubmed-word-count/README.md:4-17), plus unit coverage
  * for the lemmatizer, tagger, ASN.1 parser, and NDJSON contract.
  */
class KeywordPipelineSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/pubmed/$name").getPath

  private val golden = Set(
    "article", "review", "different", "publication", "breast", "cancer", "man")

  test("v1 golden: README abstract yields exactly the 7 golden keywords") {
    val articles = Articles.readNdjson(spark, res("articles.ndjson"))
    val abstracts = Articles.abstracts(articles)
    val out = KeywordPipeline.invertedIndexV1(abstracts, "pmid", "abstract")
      .where(col("pmid") === 123456L)
      .collect().map(_.getString(0)).toSet
    assert(out == golden)
  }

  test("v2 golden: POS-aware pipeline agrees on the golden abstract") {
    val articles = Articles.readNdjson(spark, res("articles.ndjson"))
    val out = KeywordPipeline.keywordTableV2(
        Articles.abstracts(articles), "pmid", "abstract", lit(1999))
      .where(col("pmid") === 123456L)
      .collect()
    assert(out.map(_.getString(1)).toSet == golden)
    assert(out.forall(_.getInt(2) == 1999))
  }

  test("asn1 parser recovers pmids, abstracts, quoted-quote escapes") {
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(res("1999_1_num_0"))))
    val arts = Asn1.articles(content)
    assert(arts.map(_.pmid) == Seq(123456L, 123457L, 123458L))
    assert(arts(1).abstractText.isEmpty)
    assert(arts(2).abstractText.get.contains("\"tumor\""))
  }

  test("asn1 source recovers year/month from the reference file naming") {
    val df = Articles.readAsn1(spark, res("1999_1_num_0"))
    val rows = df.orderBy("pmid").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getInt(2) == 1999 && r.getInt(3) == 1))
    assert(rows(1).isNullAt(1)) // abstract-less article
  }

  test("ndjson abstracts filter drops abstract-less articles") {
    val abstracts = Articles.abstracts(
      Articles.readNdjson(spark, res("articles.ndjson")))
    assert(abstracts.select("pmid").collect().map(_.getLong(0)).toSet ==
      Set(123456L, 123458L))
  }

  test("robust ndjson read quarantines malformed lines, keeps the rest") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ndjson-robust").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.ndjson"),
      ("""{"pmid": 1, "medent": {"abstract": "good one"}}""" + "\n" +
        """{"pmid": broken JSON here""" + "\n" +
        """{"pmid": 2, "medent": {}}""" + "\n").getBytes)
    val (clean, quarantined) = Articles.quarantine(
      Articles.readNdjsonRobust(spark, dir))
    assert(clean.select("pmid").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
    val bad = quarantined.collect().map(_.getString(0))
    assert(bad.length == 1 && bad(0).contains("broken JSON"))
  }

  test("lemmatizer rules and exceptions") {
    assert(Lemmatizer.noun("publications") == "publication")
    assert(Lemmatizer.noun("men") == "man")
    assert(Lemmatizer.noun("classes") == "class")
    assert(Lemmatizer.noun("studies") == "study")
    assert(Lemmatizer.noun("analyses") == "analysis")
    assert(Lemmatizer.noun("status") == "status")
    assert(Lemmatizer.noun("is") == "is") // short-word guard
    assert(Lemmatizer.verb("is") == "be")
    assert(Lemmatizer.verb("running") == "run")
    assert(Lemmatizer.verb("showed") == "show")
    assert(Lemmatizer.verb("using") == "use")
    assert(Lemmatizer.adjective("larger") == "large")
    assert(Lemmatizer.lemma("jumped", None) == "jumped") // fallthrough
  }

  test("pos tagger covers the golden sentence") {
    val tags = PosTagger.tag(Seq(
      "This", "article", "is", "a", "review", "of", "the", "different",
      "publications", "on", "breast", "cancer", "in", "men", "."))
    val m = tags.toMap
    assert(m("This") == "DT" && m("is") == "VBZ" && m("different") == "JJ")
    assert(m("publications") == "NNS" && m("cancer") == "NN")
    assert(PosTagger.toWordnet("NNS").contains('n'))
    assert(PosTagger.toWordnet("DT").isEmpty)
  }

  test("v2 keywords never contain stopwords (post-lemma filter, D4 fix)") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val kws = KeywordPipeline.keywordTableV2(docs, "doc_id", "text", lit(2024))
      .select("keyword").collect().map(_.getString(0))
    assert(kws.toSet.intersect(Stopwords.mrc.toSet).isEmpty)
  }
}
