package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable `Column => Column` text operators — the reference's keyword
  * cleaning chain re-expressed as codegen'd Catalyst built-ins (no UDFs on
  * the hot path).
  *
  * Reference semantics:
  *  - clean chain: spark-pubmed-word-count/word_count.py:51-58
  *  - tokenize: word_count.py:60
  *  - per-doc distinct BEFORE explode (cardinality reduction early):
  *    word_count.py:61-62
  *  - stopword removal: extract_keywords_from_all_abstracts.py:79
  */
object TextOps {

  /** Lowercase, strip everything but letters and spaces.
    * Mirrors the regex-clean chain at word_count.py:51-58 collapsed into
    * one codegen'd `regexp_replace`.
    */
  def clean(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z ]", " "))

  /** Whitespace tokens of the cleaned text, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(clean(c), "\\s+"), t => length(t) > 0)

  /** Per-document distinct tokens (array_distinct BEFORE explode keeps the
    * reference's per-doc set semantics and shrinks shuffle input).
    */
  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Remove stopwords from a token array. The vocabulary is a literal
    * array so it constant-folds into codegen (no broadcast needed for a
    * few hundred words).
    */
  def dropStopwords(tokensCol: Column, stop: Seq[String]): Column =
    array_except(tokensCol, array(stop.map(lit): _*))

  /** Full keyword chain: clean -> tokenize -> per-doc distinct -> minus
    * stopwords. Output order is first-occurrence (array_except preserves
    * left order), callers needing determinism should sort downstream.
    */
  def keywords(c: Column, stop: Seq[String]): Column =
    dropStopwords(distinctTokens(c), stop)

  /** Count of non-empty whitespace tokens (cheap token counting). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-unit count: word pieces, numbers, or single
    * non-space symbols (a public GPT-2-style pre-tokenizer shape).
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
}
