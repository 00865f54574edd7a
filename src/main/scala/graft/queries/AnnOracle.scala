package graft.queries

/** Full DuckDB oracles for the IVF-trained ANN queries — the round-7
  * verdict's "shrink the rows-only set" ask.
  *
  * What made these `no_oracle` before was the trained artifact: the
  * IVF centroids came from a sample gated on Spark's builtin murmur
  * hash (not SQL-expressible) and a partition-order-dependent collect.
  * Both are gone: the gate is SplitMix64 (four shifts, two wrapping
  * multiplies — exactly replayable in HUGEINT with the MinHash
  * oracle's split-multiplication technique) and the sample is
  * collected ORDER BY vec_id with every training fold sequential on
  * the driver. That makes the whole pipeline — sample, farthest-point
  * seeding, 5 Lloyd iterations, corpus assignment, probe ranking,
  * exact rerank — a deterministic chain of IEEE double ops that DuckDB
  * replays bit-for-bit:
  *
  *  - per-(centroid, dim) Lloyd sums are `list_reduce` left folds over
  *    `list(val ORDER BY vec_id)` seeded with 0.0 — the exact
  *    accumulation order of the Scala `while` loop over the ordered
  *    sample (the `dotSql` parity precedent, proven by every green
  *    sim_* oracle);
  *  - argmin/argmax tie-breaks mirror the strict inequalities in
  *    `IvfAnn.nearest` / `farthestPointSeeds` (first minimal index):
  *    `ORDER BY d, c` / `ORDER BY mind DESC, vec_id`;
  *  - the final sim rounding is DuckDB's own round(DOUBLE, 6), which
  *    [[org.apache.spark.sql.graftx.RoundAwayFromZero]] reproduces by
  *    construction.
  *
  * The farthest-point chain unrolls to 16 seed CTEs and Lloyd to 5
  * assignment/re-mean stages — the TrainerOracle "unrolled merge
  * rounds" pattern (docs/ORACLES.md).
  */
object AnnOracle {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val H63 = "9223372036854775808::HUGEINT" // 2^63
  private val SmA = "13787848793156543929::HUGEINT" // 0xBF58476D1CE4E5B9
  private val SmB = "10723151780598845931::HUGEINT" // 0x94D049BB133111EB
  private val SmPhi = "11400714819323198485::HUGEINT" // 0x9E3779B97F4A7C15

  /** (a * b) mod 2^64, 32-bit split so intermediates fit int128. */
  private def mul64(a: String, b: String): String =
    s"(((( ($a) // 4294967296) * ($b)) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * ($b)) % $M64"

  /** The IVF query's geometry: nlist=16, nprobe=4, k=5, sample
    * modulus n/(16*100) — `IvfAnn.ivfTopK` defaults over the
    * embeddings table with the `vec_id < 10` query subset.
    */
  private val nlist = 16
  private val nprobe = 4
  private val k = 5

  /** Squared L2 distance between two DOUBLE[] lists, sequential fold
    * (`d += x*x` order).
    */
  private def dist2(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      s"x -> (x[1] - x[2]) * (x[1] - x[2])))"

  /** Dot product of two DOUBLE[] lists (inputs already cast). */
  private def dot2(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))"

  /** Shared sample-gate chain: splitmix64(vec_id) staged over CTEs —
    * u64 domain end to end, then back to the signed reading for
    * Spark's pmod. `divisor` is the sample-modulus divisor of the
    * training being replayed — n/(nlist*100) for IVF
    * (IvfAnn.trainCentroids), n/(ksub*100) for PQ
    * (PqAnn.trainCodebooks). They happen to coincide at the 16/16
    * defaults, but the coupling is structural here so changing either
    * default can't silently desynchronize the other oracle (ADVICE r9).
    */
  private def gateCtes(divisor: Int): String = s"""WITH modv AS (
  SELECT greatest(1::HUGEINT, (count(*) // $divisor)::HUGEINT) AS md
  FROM embeddings
), sm0 AS (
  SELECT vec_id, embedding,
    (((CAST(vec_id AS HUGEINT) % $M64) + $M64 + $SmPhi) % $M64) AS z0
  FROM embeddings
), sm1 AS (SELECT *, ${mul64("xor(z0, z0 // 1073741824)", SmA)} AS z1 FROM sm0),
sm2 AS (SELECT *, ${mul64("xor(z1, z1 // 134217728)", SmB)} AS z2 FROM sm1),
sm3 AS (SELECT *, xor(z2, z2 // 2147483648) AS z3 FROM sm2),
smp AS MATERIALIZED (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM sm3, modv
  WHERE ((((CASE WHEN z3 >= $H63 THEN z3 - $M64 ELSE z3 END) % md) + md) % md) = 0
)"""

  /** CTE chain from the embeddings table to `ivf` = the approximate
    * top-k (qid, vec_id, sim, rank). Starts with WITH; callers append
    * further CTEs before the final SELECT.
    */
  private def ivfCtes: String = {
    val gate = gateCtes(nlist * 100)
    // farthest-point seeding: s0 = lowest vec_id; each next seed the
    // sample maximizing the running min-distance, ties lowest vec_id
    val seed0 = s""",
s0 AS MATERIALIZED (SELECT emb FROM smp ORDER BY vec_id LIMIT 1),
m0 AS MATERIALIZED (SELECT p.vec_id, p.emb, ${dist2("p.emb", "s.emb")} AS mind
  FROM smp p, s0 s)"""
    val seedChain = (1 until nlist).map { c =>
      s""",
s$c AS MATERIALIZED (SELECT emb FROM m${c - 1} ORDER BY mind DESC, vec_id LIMIT 1),
m$c AS MATERIALIZED (SELECT p.vec_id, p.emb,
    least(p.mind, ${dist2("p.emb", "s.emb")}) AS mind
  FROM m${c - 1} p, s$c s)"""
    }.mkString
    val cent0 = s""",
cent0 AS MATERIALIZED (${(0 until nlist)
      .map(c => s"SELECT $c AS c, emb FROM s$c")
      .mkString("\n  UNION ALL ")})"""
    // Lloyd x5: assign (argmin, tie lowest c), per-(c, dim) mean with
    // the sample-order fold, empty clusters keep the prior centroid
    val lloyd = (0 until 5).map { t =>
      s""",
asg$t AS MATERIALIZED (
  SELECT vec_id, emb, c FROM (
    SELECT s.vec_id, s.emb, t.c,
      row_number() OVER (PARTITION BY s.vec_id
        ORDER BY ${dist2("s.emb", "t.emb")}, t.c) AS rn
    FROM smp s CROSS JOIN cent$t t) WHERE rn = 1
), sums$t AS MATERIALIZED (
  SELECT c, i AS dim,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(emb[CAST(i AS INT)] ORDER BY vec_id)), (a, b) -> a + b) AS s,
    count(*) AS n
  FROM (SELECT vec_id, c, emb, unnest(range(1, len(emb) + 1)) AS i
        FROM asg$t)
  GROUP BY c, i
), newc$t AS MATERIALIZED (
  SELECT c, list(s / n ORDER BY dim) AS emb FROM sums$t GROUP BY c
), cent${t + 1} AS MATERIALIZED (
  SELECT p.c, coalesce(nw.emb, p.emb) AS emb
  FROM cent$t p LEFT JOIN newc$t nw USING (c)
)"""
    }.mkString
    // corpus assignment + norms, probe ranking for the query subset,
    // candidate join (self excluded), exact cosine rerank
    val queryStage = s""",
corp AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), casg AS MATERIALIZED (
  SELECT vec_id, emb, sqrt(${dot2("emb", "emb")}) AS nrm, c AS list_id
  FROM (
    SELECT x.vec_id, x.emb, t.c,
      row_number() OVER (PARTITION BY x.vec_id
        ORDER BY ${dist2("x.emb", "t.emb")}, t.c) AS rn
    FROM corp x CROSS JOIN cent5 t) WHERE rn = 1
), probes AS MATERIALIZED (
  SELECT qid, qemb, qnrm, c AS list_id FROM (
    SELECT q.vec_id AS qid, q.emb AS qemb,
      sqrt(${dot2("q.emb", "q.emb")}) AS qnrm, t.c,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY ${dist2("q.emb", "t.emb")}, t.c) AS rn
    FROM corp q CROSS JOIN cent5 t WHERE q.vec_id < 10) WHERE rn <= $nprobe
), ivf AS MATERIALIZED (
  SELECT qid, vec_id, sim,
    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM (
    SELECT p.qid, a.vec_id,
      round(${dot2("p.qemb", "a.emb")} / (p.qnrm * a.nrm), 6) AS sim
    FROM casg a JOIN probes p USING (list_id)
    WHERE a.vec_id <> p.qid)
)"""
    gate + seed0 + seedChain + cent0 + lloyd + queryStage
  }

  private val ivfTopkSql: String =
    s"""$ivfCtes
SELECT qid, vec_id, sim, rank FROM ivf WHERE rank <= $k
ORDER BY qid, rank"""

  /** sim_ann_recall: exact brute-force top-k vs the SAME replayed IVF
    * pipeline; hit counts and recall@5 per query.
    */
  private val recallSql: String =
    s"""$ivfCtes,
exact AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, e.vec_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        round(${dot2("q.emb", "e.emb")} /
          (sqrt(${dot2("q.emb", "q.emb")}) *
           sqrt(${dot2("e.emb", "e.emb")})), 6) DESC, e.vec_id) AS rank
    FROM corp q, corp e WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id)
  WHERE rank <= $k
), hits AS (
  SELECT x.qid, count(*) AS n_hits
  FROM exact x JOIN (SELECT qid, vec_id FROM ivf WHERE rank <= $k) a
    USING (qid, vec_id)
  GROUP BY x.qid
)
SELECT qid, coalesce(h.n_hits, 0) AS n_hits,
  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
FROM (SELECT DISTINCT qid FROM exact) q LEFT JOIN hits h USING (qid)
ORDER BY qid"""

  /** sim_ann_pq_topk: the PQ pipeline replayed end to end. Same gate
    * and ordered-sample discipline as IVF; per-subspace kmeans (m=8,
    * ksub=16, first-16 init, 5 Lloyd iterations) runs with `sub` as a
    * COLUMN so the 8 independent trainings share each unrolled stage;
    * ADC scores are the sub-ascending fold of LUT lookups over the
    * reconstructed-norm denominator (max(anrm, 1e-12) guard mirrored
    * as greatest); exact rerank of the top rerankFactor*k = 60.
    */
  private val pqTopkSql: String = {
    val m = 8
    val ksub = 16
    val rerank = 60 // rerankFactor(12) * k(5)
    val slices = (rel: String) => s"""
  SELECT x.vec_id, b.sub,
    list_transform(range(1, d.dsub + 1),
      i -> x.emb[CAST(b.sub * d.dsub + i AS INT)]) AS sl
  FROM $rel x CROSS JOIN subs b CROSS JOIN dims d"""
    val head = s"""${gateCtes(ksub * 100)},
dims AS (SELECT CAST(len(embedding) // $m AS INT) AS dsub
  FROM embeddings LIMIT 1),
subs AS (SELECT CAST(unnest(range(0, $m)) AS INT) AS sub),
pslice AS MATERIALIZED (${slices("smp")}),
pcb0 AS MATERIALIZED (
  SELECT sub, CAST(rn - 1 AS INT) AS c, sl AS cw FROM (
    SELECT sub, sl,
      row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
    FROM pslice) WHERE rn <= $ksub
)"""
    val lloyd = (0 until 5).map { t =>
      s""",
pasg$t AS MATERIALIZED (
  SELECT vec_id, sub, sl, c FROM (
    SELECT p.vec_id, p.sub, p.sl, t.c,
      row_number() OVER (PARTITION BY p.vec_id, p.sub
        ORDER BY ${dist2("p.sl", "t.cw")}, t.c) AS rn
    FROM pslice p JOIN pcb$t t USING (sub)) WHERE rn = 1
), psum$t AS MATERIALIZED (
  SELECT sub, c, i AS dim,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(sl[CAST(i AS INT)] ORDER BY vec_id)), (a, b) -> a + b) AS s,
    count(*) AS n
  FROM (SELECT vec_id, sub, c, sl, unnest(range(1, len(sl) + 1)) AS i
        FROM pasg$t)
  GROUP BY sub, c, i
), pnew$t AS MATERIALIZED (
  SELECT sub, c, list(s / n ORDER BY dim) AS cw FROM psum$t GROUP BY sub, c
), pcb${t + 1} AS MATERIALIZED (
  SELECT p.sub, p.c, coalesce(nw.cw, p.cw) AS cw
  FROM pcb$t p LEFT JOIN pnew$t nw USING (sub, c)
)"""
    }.mkString
    val tail = s""",
corp AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), cslice AS MATERIALIZED (${slices("corp")}),
ccode AS MATERIALIZED (
  SELECT vec_id, sub, c FROM (
    SELECT s.vec_id, s.sub, t.c,
      row_number() OVER (PARTITION BY s.vec_id, s.sub
        ORDER BY ${dist2("s.sl", "t.cw")}, t.c) AS rn
    FROM cslice s JOIN pcb5 t USING (sub)) WHERE rn = 1
), cbn AS MATERIALIZED (
  SELECT sub, c, list_sum(list_transform(cw, x -> x * x)) AS sq FROM pcb5
), anrm AS MATERIALIZED (
  SELECT cc.vec_id,
    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(q.sq ORDER BY cc.sub)), (a, b) -> a + b)) AS anrm
  FROM ccode cc JOIN cbn q USING (sub, c) GROUP BY cc.vec_id
), qe AS MATERIALIZED (
  SELECT vec_id AS qid, emb FROM corp WHERE vec_id < 10
), qn AS MATERIALIZED (
  SELECT qid, sqrt(${dot2("emb", "emb")}) AS qnrm FROM qe
), qslice AS MATERIALIZED (
  SELECT q.qid, b.sub,
    list_transform(range(1, d.dsub + 1),
      i -> q.emb[CAST(b.sub * d.dsub + i AS INT)]) AS sl
  FROM qe q CROSS JOIN subs b CROSS JOIN dims d
), qlut AS MATERIALIZED (
  SELECT q.qid, t.sub, t.c, ${dot2("q.sl", "t.cw")} AS lv
  FROM qslice q JOIN pcb5 t USING (sub)
), adc AS MATERIALIZED (
  SELECT l.qid, cc.vec_id,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(l.lv ORDER BY cc.sub)), (a, b) -> a + b) AS s
  FROM ccode cc JOIN qlut l ON l.sub = cc.sub AND l.c = cc.c
  WHERE cc.vec_id <> l.qid
  GROUP BY l.qid, cc.vec_id
), cand AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT a.qid, a.vec_id,
      row_number() OVER (PARTITION BY a.qid
        ORDER BY a.s / (q.qnrm * greatest(n.anrm, 1e-12)) DESC,
          a.vec_id) AS r
    FROM adc a JOIN qn q USING (qid) JOIN anrm n ON n.vec_id = a.vec_id)
  WHERE r <= $rerank
), pexact AS MATERIALIZED (
  SELECT c.qid, c.vec_id,
    round(${dot2("q.emb", "e.emb")} /
      (qn.qnrm * sqrt(${dot2("e.emb", "e.emb")})), 6) AS sim
  FROM cand c JOIN corp e ON e.vec_id = c.vec_id
  JOIN qe q ON q.qid = c.qid JOIN qn ON qn.qid = c.qid
)
SELECT qid, vec_id, sim, rank FROM (
  SELECT qid, vec_id, sim,
    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM pexact) WHERE rank <= $k
ORDER BY qid, rank"""
    head + lloyd + tail
  }

  val oracle: Map[String, String] = Map(
    "sim_ann_ivf_topk" -> ivfTopkSql,
    "sim_ann_recall" -> recallSql,
    "sim_ann_pq_topk" -> pqTopkSql)
}
