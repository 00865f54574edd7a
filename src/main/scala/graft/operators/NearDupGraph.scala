package graft.operators

import org.apache.spark.sql.DataFrame

/** The verified near-dup pair graph as a SHARED materialization.
  *
  * A dedup pipeline derives many products from one pair graph —
  * clustering, survivor filtering, cluster-size diagnostics, pairwise
  * edit-distance audits. Recomputing the blocking+verification cascade
  * per consumer is the anti-pattern: at 100 TB the pair graph is the
  * expensive artifact (shingle index + candidate join + verify) while
  * every derivation from it is cheap. This object memoizes the
  * persisted pair table per (dataset key, parameters) within the
  * session's JVM — the first consumer pays the compute, the rest read
  * the cached (tiny: pairs, not corpus) result. In a long-lived
  * deployment the same role is played by writing the pair table to
  * storage; the in-memory memo is the single-job form of that.
  */
object NearDupGraph {

  /** The shared artifacts: blocking candidates (id pairs) and the
    * exact-verified pair graph, both persisted. `nDocs` rides along so
    * audit consumers don't re-count the corpus.
    */
  final case class PairGraph(nDocs: Long, candidates: DataFrame,
      pairs: DataFrame, shingles: DataFrame)

  /** Bounded, session-keyed memo ([[graft.SessionMemo]]): 16 entries —
    * each holds id-pair tables, tiny next to their corpus — and a
    * long-lived session cycling datasets evicts and unpersists the
    * surplus (candidates + pairs + the shingle checkpoint) instead of
    * pinning executor memory; entries can never leak across sessions.
    */
  private val cache = new graft.SessionMemo[PairGraph](16)({ g =>
    graft.SessionMemo.free(g.candidates)
    graft.SessionMemo.free(g.pairs)
    graft.SessionMemo.free(g.shingles)
  })

  /** Candidates + exact verified Jaccard pairs (see
    * [[Dedup.jaccardPairs]]), computed once per (session, cacheKey,
    * params) and persisted.
    */
  def graph(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, dfCap: Int = 50, minShared: Int = 1,
      cacheKey: String): PairGraph =
    cache.getOrElseUpdate(docs.sparkSession,
      s"$cacheKey|$idCol|$textCol|$threshold|$dfCap|$minShared") {
      // materialize the shingle table once: the candidate chain and the
      // verify join both read it, and without the barrier each persisted
      // consumer re-tokenizes + re-shingles the corpus inside its own DAG
      val sh = Dedup.shingled(docs, idCol, textCol).localCheckpoint(true)
      val cand = Dedup.jaccardCandidates(sh, dfCap, minShared).persist()
      val pairs = Dedup.verifyJaccard(cand, sh, threshold).persist()
      PairGraph(docs.count(), cand, pairs, sh)
    }

  /** The verified pair graph alone (the common consumer). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, dfCap: Int = 50, minShared: Int = 1,
      cacheKey: String): DataFrame =
    graph(docs, idCol, textCol, threshold, dfCap, minShared, cacheKey).pairs
}
