package graft.queries

import graft.text.{Lemmatizer, PosTagger, Stopwords}

/** DuckDB oracle SQL for the POS-tag + lemmatize keyword pipelines —
  * round-7 conversions of `pipeline_keywords_v2_topk` and
  * `pipeline_pubmed_golden_v1` from rows-only to oracle-checked.
  *
  * Everything in the chain is pure string logic: the Treebank-ish
  * tokenizer is one `regexp_extract_all` (RE2 and java.util.regex agree
  * on leftmost-first alternation here), the closed-class POS lexicon
  * and the WordNet-style irregular tables bake in as VALUES via the
  * seams on [[graft.text.PosTagger]]/[[graft.text.Lemmatizer]], and the
  * suffix heuristics (tag rules, morphy detachment, fixStem) transcribe
  * to CASE expressions in the SAME branch order as the Scala, which is
  * what makes the replay exact.
  */
private[queries] object LemmaOracle {

  private def valuesOf(rows: Seq[(String, String)]): String =
    rows.map { case (w, t) => s"('$w','$t')" }.mkString(", ")

  private def strList(ws: Seq[String]): String =
    ws.map(w => s"'${w.replace("'", "''")}'").mkString(", ")

  /** Suffix helpers on a lowercase column `c`. */
  private def ew(c: String, s: String) = s"ends_with($c, '$s')"
  private def drop(c: String, n: Int) = s"substr($c, 1, length($c) - $n)"

  /** `Lemmatizer.noun` rule chain (exceptions handled by the caller). */
  private def nounRules(c: String): String =
    s"""CASE
      WHEN length($c) < 4 THEN $c
      WHEN ${ew(c, "ches")} OR ${ew(c, "shes")} THEN ${drop(c, 2)}
      WHEN ${ew(c, "ses")} OR ${ew(c, "xes")} OR ${ew(c, "zes")} THEN ${drop(c, 2)}
      WHEN ${ew(c, "ies")} AND length($c) > 4 THEN ${drop(c, 3)} || 'y'
      WHEN ${ew(c, "ss")} OR ${ew(c, "us")} OR ${ew(c, "is")} THEN $c
      WHEN ${ew(c, "s")} THEN ${drop(c, 1)}
      ELSE $c END"""

  /** `Lemmatizer.verb` split into (done, stem-needing-fixStem): both
    * CASEs walk the SAME branch order as the Scala so the first
    * matching branch decides, with NULL marking "the other column".
    */
  private def verbDone(c: String): String =
    s"""CASE
      WHEN length($c) < 4 THEN $c
      WHEN ${ew(c, "ies")} AND length($c) > 4 THEN ${drop(c, 3)} || 'y'
      WHEN ${ew(c, "ing")} AND length($c) > 5 THEN NULL
      WHEN ${ew(c, "ied")} THEN ${drop(c, 3)} || 'y'
      WHEN ${ew(c, "ed")} AND length($c) > 4 THEN NULL
      WHEN ${ew(c, "es")} AND length($c) > 4 THEN NULL
      WHEN ${ew(c, "ss")} OR ${ew(c, "us")} OR ${ew(c, "is")} THEN $c
      WHEN ${ew(c, "s")} THEN ${drop(c, 1)}
      ELSE $c END"""

  private def verbStem(c: String): String =
    s"""CASE
      WHEN length($c) < 4 THEN NULL
      WHEN ${ew(c, "ies")} AND length($c) > 4 THEN NULL
      WHEN ${ew(c, "ing")} AND length($c) > 5 THEN ${drop(c, 3)}
      WHEN ${ew(c, "ied")} THEN NULL
      WHEN ${ew(c, "ed")} AND length($c) > 4 THEN ${drop(c, 2)}
      WHEN ${ew(c, "es")} AND length($c) > 4 THEN ${drop(c, 2)}
      ELSE NULL END"""

  private def adjDone(c: String): String =
    s"""CASE
      WHEN length($c) < 5 THEN $c
      WHEN ${ew(c, "est")} THEN NULL
      WHEN ${ew(c, "er")} THEN NULL
      ELSE $c END"""

  private def adjStem(c: String): String =
    s"""CASE
      WHEN length($c) < 5 THEN NULL
      WHEN ${ew(c, "est")} THEN ${drop(c, 3)}
      WHEN ${ew(c, "er")} THEN ${drop(c, 2)}
      ELSE NULL END"""

  /** `Lemmatizer.fixStem` on a (possibly NULL) stem column `s`. */
  private def fixStem(s: String): String = {
    val last = s"substr($s, length($s), 1)"
    val last2 = s"substr($s, length($s) - 1, 1)"
    val last3 = s"substr($s, length($s) - 2, 1)"
    s"""CASE
      WHEN length($s) >= 3 AND $last = $last2
        AND $last NOT IN ('a','e','i','o','u')
        AND $last NOT IN ('l','s') THEN ${drop(s, 1)}
      WHEN length($s) >= 3 AND $last IN ('c','g','v','z')
        AND $last2 <> 'n' THEN $s || 'e'
      WHEN length($s) = 3 AND $last NOT IN ('a','e','i','o','u')
        AND $last NOT IN ('w','x','y')
        AND substr($s, 2, 1) IN ('a','e','i','o','u')
        AND substr($s, 1, 1) NOT IN ('a','e','i','o','u') THEN $s || 'e'
      WHEN length($s) >= 5 AND (${ew(s, "at")} OR ${ew(s, "ut")})
        AND $last3 NOT IN ('a','e','i','o','u') THEN $s || 'e'
      ELSE $s END"""
  }

  /** `PosTagger.tagWord`'s suffix fallback on lowercase column `lw`
    * (the lexicon join is the caller's COALESCE partner). The CD rule
    * checks for any Unicode letter, matching Character.isLetter.
    */
  private def tagRules(lw: String): String =
    s"""CASE
      WHEN $lw = '' THEN 'NN'
      WHEN NOT regexp_matches($lw, '\\p{L}') THEN 'CD'
      WHEN ${ew(lw, "ly")} THEN 'RB'
      WHEN ${ew(lw, "ing")} AND length($lw) > 4 THEN 'VBG'
      WHEN ${ew(lw, "ed")} AND length($lw) > 3 THEN 'VBN'
      WHEN (${ew(lw, "ous")} OR ${ew(lw, "ful")} OR ${ew(lw, "ive")}
        OR ${ew(lw, "able")} OR ${ew(lw, "ible")} OR ${ew(lw, "al")}
        OR ${ew(lw, "ic")} OR ${ew(lw, "ent")}) AND length($lw) > 4 THEN 'JJ'
      WHEN ${ew(lw, "s")} AND NOT ${ew(lw, "ss")} AND length($lw) > 3 THEN 'NNS'
      ELSE 'NN' END"""

  /** The Treebank-ish raw tokenizer regex, SQL-quoted. */
  private val tokRegex =
    raw"'[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+(?:\.[0-9]+)?|[^A-Za-z0-9\s]'"

  /** v2 keyword top-100: tokenize raw -> tag -> POS-aware lemmatize ->
    * alpha filter -> per-doc distinct -> post-lemma stopword drop ->
    * count.
    */
  def keywordsV2TopK: String =
    s"""WITH lex(w, tag) AS (VALUES ${valuesOf(PosTagger.lexiconRows)}),
nexc(w, l) AS (VALUES ${valuesOf(Lemmatizer.nounExceptionRows)}),
vexc(w, l) AS (VALUES ${valuesOf(Lemmatizer.verbExceptionRows)}),
aexc(w, l) AS (VALUES ${valuesOf(Lemmatizer.adjExceptionRows)}),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, $tokRegex)) AS w
  FROM documents
),
tg AS (
  SELECT t.doc_id, lower(t.w) AS lw,
    coalesce(lex.tag, ${tagRules("lower(t.w)")}) AS penn
  FROM tok t LEFT JOIN lex ON lex.w = lower(t.w)
),
wn AS (
  SELECT doc_id, lw,
    CASE substr(penn, 1, 1) WHEN 'J' THEN 'a' WHEN 'V' THEN 'v'
      WHEN 'N' THEN 'n' WHEN 'R' THEN 'r' ELSE '' END AS wnc
  FROM tg
),
st AS (
  SELECT wn.doc_id, wn.lw, wn.wnc,
    nexc.l AS nl, vexc.l AS vl, aexc.l AS al,
    CASE WHEN wnc = 'n' THEN ${nounRules("wn.lw")} END AS nr,
    CASE WHEN wnc = 'v' THEN ${verbDone("wn.lw")} END AS vdone,
    CASE WHEN wnc = 'v' THEN ${verbStem("wn.lw")} END AS vstem,
    CASE WHEN wnc = 'a' THEN ${adjDone("wn.lw")} END AS adone,
    CASE WHEN wnc = 'a' THEN ${adjStem("wn.lw")} END AS astem
  FROM wn
  LEFT JOIN nexc ON wn.wnc = 'n' AND nexc.w = wn.lw
  LEFT JOIN vexc ON wn.wnc = 'v' AND vexc.w = wn.lw
  LEFT JOIN aexc ON wn.wnc = 'a' AND aexc.w = wn.lw
),
lm AS (
  SELECT doc_id,
    CASE wnc
      WHEN 'n' THEN coalesce(nl, nr)
      WHEN 'v' THEN coalesce(vl, vdone, ${fixStem("vstem")})
      WHEN 'a' THEN coalesce(al, adone, ${fixStem("astem")})
      ELSE lw END AS lemma
  FROM st
),
kw AS (
  SELECT DISTINCT doc_id, lemma AS keyword FROM lm
  WHERE regexp_matches(lemma, '[a-zA-Z]')
    AND lemma NOT IN (${strList(Stopwords.mrc)})
)
SELECT keyword, CAST(count(*) AS BIGINT) AS cnt FROM kw GROUP BY keyword
ORDER BY cnt DESC, keyword LIMIT 100"""

  /** The reference's golden v1 inverted index over its inline example
    * document — clean/split/distinct, PRE-lemma english stopword drop,
    * noun lemmatization, distinct, ordered by word.
    */
  def pubmedGoldenV1: String =
    s"""WITH nexc(w, l) AS (VALUES ${valuesOf(Lemmatizer.nounExceptionRows)}),
doc(pmid, abstract) AS (VALUES (CAST(123456 AS BIGINT),
  'This article is a review of the different publications on breast cancer in men.')),
tok AS (
  SELECT pmid, unnest(list_distinct(list_filter(
    string_split_regex(lower(regexp_replace(abstract, '[^a-zA-Z ]', ' ', 'g')), '\\s+'),
    w -> w <> ''))) AS w
  FROM doc
),
fw AS (
  SELECT pmid, w FROM tok
  WHERE w NOT IN (${strList(Stopwords.english)})
),
lem AS (
  SELECT fw.pmid, coalesce(nexc.l, ${nounRules("fw.w")}) AS word
  FROM fw LEFT JOIN nexc ON nexc.w = fw.w
)
SELECT DISTINCT word, pmid FROM lem ORDER BY word"""
}
