package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.LemmatizeNouns

import graft.text.{Lemmatizer, PosTagger, Stopwords, TextOps}

/** The reference's two keyword-extraction pipelines as composable
  * column transforms (SURVEY.md §2.1 O13-O21).
  *
  * v1's noun lemmatization is a native expression (LemmatizeNouns);
  * only the POS-aware v2 steps remain Scala UDFs (dictionary-backed,
  * SURVEY.md §2.2 minimal-UDF policy); everything around them is
  * codegen'd built-ins, and per-doc distinct happens before explode.
  */
object KeywordPipeline {

  /** v1 (word_count.py:51-65): regex clean -> split -> stopword filter
    * PRE-lemma (the reference applies it only before lemmatization,
    * defect D4 — reproduced faithfully here because v1's golden README
    * output depends on v1 semantics) -> noun-lemmatize -> per-doc set.
    */
  def keywordsV1(text: Column): Column =
    array_distinct(LemmatizeNouns.column(
      TextOps.dropStopwords(TextOps.distinctTokens(text), Stopwords.english)))

  /** v2 (extract_kw...py:65-80): tokenize raw text -> POS tag ->
    * POS-aware lemmatize (fallthrough to raw token) -> lowercase ->
    * alpha filter -> per-doc set -> stopword filter POST-lemma.
    */
  private val posLemmas = udf { (ts: Seq[String]) =>
    PosTagger.tag(ts).map { case (w, penn) =>
      Lemmatizer.lemma(w.toLowerCase, PosTagger.toWordnet(penn))
    }
  }

  /** Word-tokenizer for raw (uncleaned) text: splits off punctuation as
    * its own tokens, Treebank-style, keeping contractions together.
    */
  private val tokenizeRaw = udf { (s: String) =>
    if (s == null) Seq.empty[String]
    else "[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+(?:\\.[0-9]+)?|[^A-Za-z0-9\\s]"
      .r.findAllIn(s).toSeq
  }

  def keywordsV2(text: Column): Column =
    TextOps.dropStopwords(
      array_distinct(
        filter(posLemmas(tokenizeRaw(text)), t => t.rlike("[a-zA-Z]"))),
      Stopwords.mrc)

  /** (id, keyword) inverted index — v1's output shape (word, pmid). */
  def invertedIndexV1(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      explode(keywordsV1(col(textCol))).as("word"),
      col(idCol).as("pmid"))

  /** (pmid, keyword, year) — v2's output shape (extract_kw...py:93-103). */
  def keywordTableV2(docs: DataFrame, idCol: String, textCol: String,
      yearCol: Column): DataFrame =
    docs.select(
      col(idCol).as("pmid"),
      explode(keywordsV2(col(textCol))).as("keyword"),
      yearCol.as("year"))
}
