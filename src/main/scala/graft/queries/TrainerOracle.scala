package graft.queries

/** DuckDB oracle SQL for the subword-tokenizer trainers — round-7
  * conversions of `text_bpe_vocab` / `text_bpe_encode` /
  * `text_wordpiece_vocab` / `text_wordpiece_encode` from rows-only to
  * oracle-checked.
  *
  * Both trainers are INTEGER algorithms end to end (corpus-weighted
  * pair counts, exact tie-breaks, greedy non-overlapping rewrites), so
  * the whole merge loop replays in SQL as 30 unrolled rounds of
  * MATERIALIZED CTEs (materialization is load-bearing: each round
  * references its predecessor several times, and DuckDB inlines
  * non-materialized CTEs — the chain would expand exponentially).
  *
  *  - BPE picks argmax pair count with (total DESC, a, b) — a plain
  *    ORDER BY; the greedy left-to-right merge is a `list_reduce` fold
  *    (identical construct to the Spark-side `aggregate` fold).
  *  - WordPiece maximizes count(ab)/(count(a)*count(b)) compared by
  *    EXACT cross-multiplication — no total order a single ORDER BY
  *    key can express, so the winner is the NOT-EXISTS anti-join
  *    survivor, with products in HUGEINT (pc * sa * sb can pass
  *    int64). Encoding replays BERT greedy longest-match-first as a
  *    recursive walk over a static (word, start) -> longest-piece
  *    table — only joins in the recursive term.
  *
  * Early exhaustion uses the '' sentinel pair (CROSS JOIN keeps the
  * round a no-op, matching the trainers' stop-early contract), and the
  * encode profiles' unseen-word fallback can never fire here because
  * the training corpus IS the encoded corpus (every word type hits the
  * join).
  */
private[queries] object TrainerOracle {

  private val tokensFromDocs =
    raw"""SELECT doc_id, unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '')) AS word
  FROM documents"""

  /** Greedy left-to-right (A, B) merge of the `syms` column as a
    * list_reduce over singleton lists (uniform accumulator type).
    */
  private def mergeFold(a: String, b: String, merged: String): String =
    s"list_reduce(list_prepend(CAST([] AS VARCHAR[]), " +
      s"list_transform(syms, x -> [x])), " +
      s"(acc, xl) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = $a " +
      s"AND xl[1] = $b THEN list_append(acc[1:len(acc)-1], $merged) " +
      s"ELSE list_append(acc, xl[1]) END)"

  // ---------------------------------------------------------------- BPE

  private val bpeW0 =
    raw"""w0 AS MATERIALIZED (
  SELECT word, cnt, string_split(word, '') AS syms FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      $tokensFromDocs)
    GROUP BY word)
)"""

  private def bpeRound(i: Int): String = {
    val p = i - 1
    s"""m$i AS MATERIALIZED (
  SELECT coalesce(max(a), '') AS ma, coalesce(max(b), '') AS mb FROM (
    SELECT a, b FROM (
      SELECT w.syms[CAST(j AS INT)] AS a, w.syms[CAST(j AS INT) + 1] AS b,
        sum(w.cnt) AS total
      FROM w$p w, unnest(range(1, len(w.syms))) AS t(j)
      GROUP BY 1, 2 HAVING sum(w.cnt) >= 2
    ) ORDER BY total DESC, a, b LIMIT 1)
), w$i AS MATERIALIZED (
  SELECT w.word, w.cnt,
    CASE WHEN m.ma = '' THEN w.syms
      ELSE ${mergeFold("m.ma", "m.mb", "m.ma || m.mb")} END AS syms
  FROM w$p w CROSS JOIN m$i m
)"""
  }

  private def bpeChain(rounds: Int): String =
    (bpeW0 +: (1 to rounds).map(bpeRound)).mkString(",\n")

  /** 30-merge vocabulary profile: top 40 subwords by corpus mass. */
  def bpeVocab: String =
    s"""WITH ${bpeChain(30)}
SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occurrences,
  CAST(count(*) AS BIGINT) AS n_distinct_words
FROM (SELECT cnt, unnest(syms) AS token FROM w30)
GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 40"""

  /** Per-doc encoding profile under the 20-merge snapshot (prefix
    * determinism: the first 20 rounds ARE the 20-merge model).
    */
  def bpeEncode: String =
    s"""WITH ${bpeChain(20)},
toks AS (
  $tokensFromDocs
), lens AS (SELECT word, CAST(len(syms) AS BIGINT) AS ns FROM w20)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(ns) AS BIGINT) AS n_subwords, round(avg(ns), 4) AS fertility
FROM toks JOIN lens USING (word)
GROUP BY doc_id ORDER BY doc_id"""

  // ---------------------------------------------------------- WordPiece

  private val wpInitSyms =
    "list_transform(string_split(word, ''), " +
      "(c, i) -> CASE WHEN i = 1 THEN c ELSE '##' || c END)"

  private val wpW0 =
    s"""w0 AS MATERIALIZED (
  SELECT word, cnt, $wpInitSyms AS syms
  FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      $tokensFromDocs)
    GROUP BY word)
)"""

  private def wpRound(i: Int): String = {
    val p = i - 1
    val ab = "(m.ma || CASE WHEN starts_with(m.mb, '##') " +
      "THEN substr(m.mb, 3) ELSE m.mb END)"
    s"""sc$i AS MATERIALIZED (
  SELECT s, CAST(sum(cnt) AS HUGEINT) AS sc FROM (
    SELECT cnt, unnest(syms) AS s FROM w$p) GROUP BY s
), pc$i AS MATERIALIZED (
  SELECT a, b, CAST(sum(cnt) AS HUGEINT) AS pc FROM (
    SELECT w.cnt, w.syms[CAST(j AS INT)] AS a, w.syms[CAST(j AS INT) + 1] AS b
    FROM w$p w, unnest(range(1, len(w.syms))) AS t(j))
  GROUP BY 1, 2 HAVING sum(cnt) >= 2
), cand$i AS MATERIALIZED (
  SELECT p.a, p.b, p.pc, sa.sc * sb.sc AS den
  FROM pc$i p JOIN sc$i sa ON sa.s = p.a JOIN sc$i sb ON sb.s = p.b
), m$i AS MATERIALIZED (
  SELECT coalesce(max(a), '') AS ma, coalesce(max(b), '') AS mb FROM (
    SELECT r.a, r.b FROM cand$i r
    WHERE NOT EXISTS (SELECT 1 FROM cand$i s
      WHERE s.pc * r.den > r.pc * s.den
         OR (s.pc * r.den = r.pc * s.den
             AND (s.a < r.a OR (s.a = r.a AND s.b < r.b)))))
), w$i AS MATERIALIZED (
  SELECT w.word, w.cnt,
    CASE WHEN m.ma = '' THEN w.syms
      ELSE ${mergeFold("m.ma", "m.mb", ab)} END AS syms
  FROM w$p w CROSS JOIN m$i m
)"""
  }

  private val wpChain = (wpW0 +: (1 to 30).map(wpRound)).mkString(",\n")

  /** 30-merge WordPiece vocabulary profile. */
  def wordpieceVocab: String =
    s"""WITH $wpChain
SELECT piece, CAST(sum(cnt) AS BIGINT) AS n_occurrences,
  CAST(count(*) AS BIGINT) AS n_distinct_words
FROM (SELECT cnt, unnest(syms) AS piece FROM w30)
GROUP BY piece ORDER BY n_occurrences DESC, piece LIMIT 40"""

  /** BERT-style encode profile: greedy longest-match-first against the
    * trained vocab (alphabet + merge products), OOV -> -1.
    */
  def wordpieceEncode: String = {
    val mall = (1 to 30).map(i => s"SELECT ma, mb FROM m$i")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE $wpChain,
mall AS (SELECT * FROM ($mall) WHERE ma <> ''),
voc AS (
  SELECT DISTINCT piece FROM (
    SELECT unnest($wpInitSyms) AS piece
    FROM w0
    UNION ALL
    SELECT ma || CASE WHEN starts_with(mb, '##') THEN substr(mb, 3) ELSE mb END
    FROM mall)
),
vb AS (
  SELECT piece, starts_with(piece, '##') AS cont,
    CASE WHEN starts_with(piece, '##') THEN substr(piece, 3) ELSE piece END AS base
  FROM voc
),
pos AS (
  SELECT word, CAST(s AS INT) AS start
  FROM w30, unnest(range(0, length(word))) AS t(s)
),
best AS (
  SELECT p.word, p.start, CAST(max(length(v.base)) AS INT) AS bl
  FROM pos p JOIN vb v
    ON v.cont = (p.start > 0)
   AND substr(p.word, p.start + 1, length(v.base)) = v.base
  GROUP BY p.word, p.start
),
walk(word, start, n, oov) AS (
  SELECT word, 0, 0, FALSE FROM w30
  UNION ALL
  SELECT w.word,
    CAST(CASE WHEN b.bl IS NULL THEN length(w.word) ELSE w.start + b.bl END AS INT),
    CASE WHEN b.bl IS NULL THEN w.n ELSE w.n + 1 END,
    b.bl IS NULL
  FROM walk w LEFT JOIN best b ON b.word = w.word AND b.start = w.start
  WHERE w.start < length(w.word) AND NOT w.oov
),
seg AS (
  SELECT word, CASE WHEN oov THEN CAST(-1 AS BIGINT) ELSE CAST(n AS BIGINT) END AS ns
  FROM walk WHERE start >= length(word)
),
toks AS (
  $tokensFromDocs
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(CASE WHEN ns = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  CAST(sum(CASE WHEN ns = -1 THEN 1 ELSE ns END) AS BIGINT) AS n_subwords,
  round(avg(CASE WHEN ns <> -1 THEN ns END), 4) AS fertility
FROM toks JOIN seg USING (word)
GROUP BY doc_id ORDER BY doc_id"""
  }
}
