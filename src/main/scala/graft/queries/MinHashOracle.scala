package graft.queries

/** DuckDB oracle SQL for the MinHash/SimHash dedup family — round-7
  * conversions of four formerly rows-only queries.
  *
  * The whole signature pipeline (FNV-1a token hashes, the Phi rolling
  * 3-gram mix, murmur fmix64, `(a*x+b) mod 2^31-1` permutation mins,
  * banded key assembly — [[org.apache.spark.sql.graftx.TextShingles]] /
  * `MinHashBands` / `TextSimHash`) is pure integer arithmetic, so DuckDB
  * replays it exactly in HUGEINT (int128). The one subtlety is 64-bit
  * wrapping multiplication: a 64x64 product can reach 2^128, one past
  * int128's ceiling, so `mul64` splits the left operand into 32-bit
  * halves (each partial product <= 2^96). Values stay in the UNSIGNED
  * [0, 2^64) domain end to end; `xor` works on HUGEINT directly and
  * `>>> k` is division by 2^k. Seeded permutation params are baked in
  * as a VALUES table via [[org.apache.spark.sql.graftx.MinHashBands.permRows]],
  * mirroring the LangId profile-row seam.
  *
  * Expressions are STAGED through CTE columns (one primitive per
  * stage): inlining the whole fmix64(mix(...)) tree would repeat each
  * subterm ~2^6 times (every xor/mul64 references its operand twice).
  */
private[queries] object MinHashOracle {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val Phi = "11400714819323198485::HUGEINT" // 0x9E3779B97F4A7C15
  private val FnvBasis = "14695981039346656037::HUGEINT" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211::HUGEINT" // 0x100000001b3
  private val Mix1 = "18397679294719823053::HUGEINT" // 0xff51afd7ed558ccd
  private val Mix2 = "14181476777654086739::HUGEINT" // 0xc4ceb9fe1a85ec53

  /** (a * b) mod 2^64 with a, b in [0, 2^64): 32-bit-split so every
    * intermediate fits int128.
    */
  private def mul64(a: String, b: String): String =
    s"(((( ($a) // 4294967296) * ($b)) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * ($b)) % $M64"

  /** x XOR (x >>> 33) on the unsigned domain. */
  private def shr33(a: String): String = s"xor($a, ($a) // 8589934592)"

  /** murmur fmix64 staged over five CTEs; exposes `<prefix>_out`. */
  private def fmixStages(src: String, col: String, prefix: String): String =
    s"""${prefix}a AS (SELECT *, ${shr33(col)} AS ${prefix}1 FROM $src),
${prefix}b AS (SELECT *, ${mul64(s"${prefix}1", Mix1)} AS ${prefix}2 FROM ${prefix}a),
${prefix}c AS (SELECT *, ${shr33(s"${prefix}2")} AS ${prefix}3 FROM ${prefix}b),
${prefix}d AS (SELECT *, ${mul64(s"${prefix}3", Mix2)} AS ${prefix}4 FROM ${prefix}c),
${prefix}e AS (SELECT *, ${shr33(s"${prefix}4")} AS ${prefix}_out FROM ${prefix}d)"""

  /** The registered LSH queries use bands=16 x rowsPerBand=4. */
  private val permVals =
    org.apache.spark.sql.graftx.MinHashBands.permRows(64)
      .map { case (p, a, b) => s"($p, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")

  private val pw64 =
    (0 until 64).map(j => s"($j, ${BigInt(1) << j}::HUGEINT)").mkString(", ")

  /** Tokens + per-token FNV-1a hashes (same `[^a-zA-Z ]`->space
    * tokenizer as the string-shingle oracle; ASCII-letter tokens so
    * `ord` == byte). `src` is the (doc_id, text) relation to shingle —
    * "documents" for the standalone dedup queries, a filtered CTE for
    * the corpus-funnel composition.
    */
  private def tokPrefixFrom(src: String): String =
    raw"""toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '') AS ws
  FROM $src
),"""

  private val tokHashCtes = s"""
tok AS (
  SELECT doc_id, CAST(i AS INT) AS tpos, ws[CAST(i AS INT)] AS w
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM toks)
),
th AS (
  SELECT doc_id, tpos,
    list_reduce(
      list_prepend($FnvBasis,
        list_transform(range(1, length(w) + 1),
          i -> CAST(ord(substr(w, CAST(i AS INT), 1)) AS HUGEINT))),
      (h, c) -> ${mul64("xor(h, c)", FnvPrime)}) AS th
  FROM tok
)"""

  private val tokPrefix = tokPrefixFrom("documents") + tokHashCtes

  /** Shingle-hash sets, permutation mins, banded keys (`kb`), and the
    * per-doc hash-set table (`ss`) for exact verification.
    */
  private val shingleCtes =
    s"""hs AS (SELECT doc_id, list(th ORDER BY tpos) AS hl, count(*) AS n FROM th GROUP BY doc_id),
rawsh AS (
  SELECT doc_id,
    hl[CAST(i AS INT)] AS ta, hl[CAST(i AS INT) + 1] AS tb, hl[CAST(i AS INT) + 2] AS tc
  FROM (SELECT doc_id, hl, unnest(range(1, n - 1)) AS i FROM hs WHERE n >= 3)
),
mx1 AS (SELECT *, ${mul64("ta", Phi)} AS m1 FROM rawsh),
mx2 AS (SELECT *, (m1 + tb) % $M64 AS m2 FROM mx1),
mx3 AS (SELECT *, ${mul64("m2", Phi)} AS m3 FROM mx2),
mx4 AS (SELECT *, (m3 + tc) % $M64 AS m4 FROM mx3),
${fmixStages("mx4", "m4", "sf")},
shset AS (SELECT DISTINCT doc_id, sf_out AS shu FROM sfe),
xv AS (
  SELECT doc_id, shu,
    CAST((((CASE WHEN shu >= 9223372036854775808::HUGEINT
      THEN shu - $M64 ELSE shu END) % 2147483647) + 2147483647) % 2147483647 AS BIGINT) AS x
  FROM shset
),
mins AS (
  SELECT doc_id, p.p, min((p.pa * xv.x + p.pb) % 2147483647) AS mn
  FROM xv CROSS JOIN perms p GROUP BY doc_id, p.p
),
bandl AS (
  SELECT doc_id, p // 4 AS band, list(mn ORDER BY p) AS ms
  FROM mins GROUP BY doc_id, p // 4
),
bh1 AS (SELECT *, CAST(ms[1] AS HUGEINT) AS h1 FROM bandl),
bh2 AS (SELECT *, (${mul64("h1", Phi)} + ms[2]) % $M64 AS h2 FROM bh1),
bh3 AS (SELECT *, (${mul64("h2", Phi)} + ms[3]) % $M64 AS h3 FROM bh2),
bh4 AS (SELECT *, (${mul64("h3", Phi)} + ms[4]) % $M64 AS h4 FROM bh3),
${fmixStages("bh4", "h4", "bf")},
kb AS (
  SELECT doc_id,
    CAST(band AS HUGEINT) * 72057594037927936 + (bf_out // 256) AS keyu
  FROM bfe
),
ss AS (SELECT doc_id, list(shu) AS s, count(*) AS n FROM shset GROUP BY doc_id)"""

  /** Bucket self-join + exact Jaccard verify: `lshp` = verified pairs. */
  private val lshPairs =
    s"""cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM kb a JOIN kb b ON a.keyu = b.keyu AND a.doc_id < b.doc_id
),
lshp AS (
  SELECT ida, idb,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
      (x.n + y.n - len(list_intersect(x.s, y.s))), 6) AS jaccard
  FROM cand JOIN ss x ON x.doc_id = ida JOIN ss y ON y.doc_id = idb
)"""

  val minhashLsh: String =
    s"""WITH perms(p, pa, pb) AS (VALUES $permVals),
$tokPrefix,
$shingleCtes,
$lshPairs
SELECT ida, idb, jaccard FROM lshp WHERE jaccard >= 0.5
ORDER BY ida, idb"""

  /** Exact pairs (the shared blocking cascade at >= 0.5) vs the LSH
    * pairs. The cascade CTEs come from [[DedupQueries.pairsCte]]'s
    * shape but renamed (sstr/sht/...) to avoid colliding with the
    * minhash CTE names.
    */
  val lshQuality: String =
    s"""WITH perms(p, pa, pb) AS (VALUES $permVals),
$tokPrefix,
$shingleCtes,
$lshPairs,
sht AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM toks WHERE len(ws) >= 3
), exs AS (SELECT doc_id, unnest(shs) AS sstr FROM sht),
dfc AS (SELECT sstr FROM exs GROUP BY sstr HAVING count(*) BETWEEN 2 AND 50),
excs AS (SELECT exs.doc_id, exs.sstr FROM exs JOIN dfc USING (sstr)),
ecand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM excs a JOIN excs b ON a.sstr = b.sstr AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
), everif AS (
  SELECT ida, idb,
    round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
      (CAST(len(x.shs) AS DOUBLE) + CAST(len(y.shs) AS DOUBLE)
        - CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)), 6) AS jaccard
  FROM ecand JOIN sht x ON x.doc_id = ida JOIN sht y ON y.doc_id = idb
), exact AS (SELECT ida, idb FROM everif WHERE jaccard >= 0.5),
lshs AS (SELECT ida, idb FROM lshp WHERE jaccard >= 0.5),
c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact),
c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lshs),
c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM
  (SELECT * FROM exact INTERSECT SELECT * FROM lshs))
SELECT n_exact, n_lsh, n_common, n_exact - n_common AS n_missed,
  CASE WHEN n_exact = 0 THEN 1.0
       ELSE round(CAST(n_common AS DOUBLE) / n_exact, 4) END AS recall
FROM c1, c2, c3"""

  /** Index the doc_id%5!=0 corpus, probe the %5==0 batch: the same
    * banded keys, restricted per side, then per-batch-doc match stats.
    */
  val incrementalBatch: String =
    s"""WITH perms(p, pa, pb) AS (VALUES $permVals),
$tokPrefix,
$shingleCtes,
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM kb b JOIN kb c ON b.keyu = c.keyu
  WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
),
ver AS (
  SELECT batch_id, corpus_id,
    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
      (x.n + y.n - len(list_intersect(x.s, y.s))), 6) AS jaccard
  FROM cand JOIN ss x ON x.doc_id = batch_id JOIN ss y ON y.doc_id = corpus_id
)
SELECT batch_id, CAST(count(*) AS BIGINT) AS n_matches, max(jaccard) AS max_jaccard
FROM ver WHERE jaccard >= 0.5
GROUP BY batch_id ORDER BY batch_id"""

  /** The whole training-corpus preparation funnel
    * (`CorpusPipeline.funnelObserved`, default Config) — round-7
    * conversion: every stage was already individually replayable, so
    * the funnel oracle is their composition. Stages: lang IN ('en'),
    * quality (>= 10 letter-run tokens, stopword ratio <= 0.6), exact
    * dedup (min doc_id per md5), MinHash-LSH survivors at 0.5 (the
    * shared signature chain over the exact-deduped subset + a
    * recursive-CTE min-id component closure), token accounting.
    */
  def corpusFunnel: String = {
    val english = graft.text.Stopwords.english
      .map(w => s"'${w.replace("'", "''")}'").mkString(", ")
    s"""WITH RECURSIVE perms(p, pa, pb) AS (VALUES $permVals),
lang AS (SELECT doc_id, text FROM documents WHERE lang IN ('en')),
${tokPrefixFrom("lang").replace("toks AS", "ltoks AS").stripSuffix(",")},
lw AS (SELECT doc_id, unnest(ws) AS w FROM ltoks),
qstat AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN w IN ($english) THEN 1 ELSE 0 END) AS BIGINT) AS nstop
  FROM lw GROUP BY doc_id
),
lq AS (
  SELECT l.doc_id, l.text, coalesce(q.n, 0) AS n_tokens,
    CAST(coalesce(q.nstop, 0) AS DOUBLE) / greatest(coalesce(q.n, 0), 1) AS stop_ratio
  FROM lang l LEFT JOIN qstat q USING (doc_id)
),
qual AS (
  SELECT doc_id, text, n_tokens FROM lq
  WHERE n_tokens >= 10 AND stop_ratio <= 0.6
),
exact AS (
  SELECT doc_id, text, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM qual) WHERE rn = 1
),
cdocs AS (SELECT doc_id, text FROM exact),
${tokPrefixFrom("cdocs")}$tokHashCtes,
$shingleCtes,
$lshPairs,
pairs05 AS (SELECT ida, idb FROM lshp WHERE jaccard >= 0.5),
edges AS (
  SELECT ida AS src, idb AS dst FROM pairs05
  UNION SELECT idb, ida FROM pairs05
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
),
losers AS (SELECT doc_id FROM comp WHERE doc_id <> component),
surv AS (
  SELECT e.doc_id, e.n_tokens FROM exact e
  WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
),
m AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
    (SELECT CAST(count(*) AS BIGINT) FROM lang) AS n_lang,
    (SELECT CAST(count(*) AS BIGINT) FROM qual) AS n_quality,
    (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM qual) AS n_exact,
    (SELECT CAST(count(*) AS BIGINT) FROM surv) AS n_near,
    (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM surv) AS total_tokens
)
SELECT stage, n_docs, total_tokens FROM (
  SELECT '1_input' AS stage, n_input AS n_docs, CAST(0 AS BIGINT) AS total_tokens FROM m
  UNION ALL SELECT '2_language', n_lang, CAST(0 AS BIGINT) FROM m
  UNION ALL SELECT '3_quality', n_quality, CAST(0 AS BIGINT) FROM m
  UNION ALL SELECT '4_exact_dedup', n_exact, CAST(0 AS BIGINT) FROM m
  UNION ALL SELECT '5_near_dedup', n_near, total_tokens FROM m
) ORDER BY stage"""
  }

  /** 64-bit SimHash votes over distinct fmix64'd token hashes, 4x16-bit
    * banded blocking, Hamming <= 3.
    */
  val simhash: String =
    s"""WITH pw(j, w) AS (VALUES $pw64),
$tokPrefix,
tset AS (SELECT DISTINCT doc_id, th FROM th),
${fmixStages("tset", "th", "tf")},
bits AS (
  SELECT doc_id, pw.j,
    sum(CASE WHEN (tf_out // pw.w) % 2 = 1 THEN 1 ELSE -1 END) AS votes
  FROM tfe CROSS JOIN pw
  GROUP BY doc_id, pw.j
),
sig AS (
  SELECT b.doc_id, sum(CASE WHEN b.votes > 0 THEN pw.w ELSE 0::HUGEINT END) AS hu
  FROM bits b JOIN pw ON pw.j = b.j GROUP BY b.doc_id
),
sigs AS (
  SELECT doc_id,
    CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
      THEN hu - $M64 ELSE hu END AS BIGINT) AS h, hu
  FROM sig
),
bands AS (
  SELECT s.doc_id, s.h, CAST(pw.j // 16 AS BIGINT) AS band, (s.hu // pw.w) % 65536 AS bval
  FROM sigs s JOIN pw ON pw.j IN (0, 16, 32, 48)
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b2.doc_id AS idb,
    bit_count(xor(a.h, b2.h)) AS hamming
  FROM bands a JOIN bands b2
    ON a.band = b2.band AND a.bval = b2.bval AND a.doc_id < b2.doc_id
)
SELECT ida, idb, CAST(hamming AS INT) AS hamming FROM cand
WHERE hamming <= 3 ORDER BY ida, idb"""
}
