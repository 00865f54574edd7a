package graft.text

/** Stopword vocabularies.
  *
  * `english` is the standard English stopword inventory (the public
  * NLTK-style list) used by the reference's v1 job
  * (reference: spark-pubmed-word-count/word_count.py:31-35).
  * `mrc` mirrors the reference's v2 custom vocabulary *shape* —
  * english ∪ single letters ∪ a few extras
  * (reference: extract-keywords-from-abstracts/mrc_stopwords.py:1-226) —
  * rebuilt from its observable construction, not copied.
  */
object Stopwords {

  val english: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all", "any",
    "both", "each", "few", "more", "most", "other", "some", "such", "no",
    "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "can", "will", "just", "don", "should", "now")

  /** v1 job's 11 extra words (word_count.py:34). */
  val customV1: Seq[String] = Seq(
    "also", "may", "could", "would", "might", "must", "shall", "using",
    "used", "use", "one")

  private val letters: Seq[String] = ('a' to 'z').map(_.toString)

  /** v2-style vocabulary: english ∪ single letters ∪ extras. */
  val mrc: Seq[String] = (english ++ letters ++ customV1).distinct

  /** Render as a SQL IN-list for DuckDB oracle parity. */
  def sqlInList(words: Seq[String]): String =
    words.map(w => s"'${w.replace("'", "''")}'").mkString("(", ",", ")")
}
