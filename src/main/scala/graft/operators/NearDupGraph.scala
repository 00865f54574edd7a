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
    * audit consumers don't re-count the corpus. `broadcastFit` is the
    * [[Dedup.shingleBroadcastFits]] decision taken ONCE on the
    * pre-checkpoint plan (parquet-derived size estimate) — consumers
    * that verify against `shingles` pass it through so the whole
    * family plans one strategy, decided by corpus size, never by a
    * hardcoded hint.
    */
  final case class PairGraph(nDocs: Long, candidates: DataFrame,
      pairs: DataFrame, shingles: DataFrame, broadcastFit: Boolean)

  /** Bounded, session-keyed memo ([[graft.SessionMemo]]): 16 entries —
    * each holds id-pair tables, tiny next to their corpus — and a
    * long-lived session cycling datasets evicts and unpersists the
    * surplus (candidates + pairs + the shingle checkpoint) instead of
    * pinning executor memory; entries can never leak across sessions.
    *
    * LIVENESS CONTRACT: eviction frees the shingle checkpoint's RDD
    * blocks, whose lineage is truncated — a caller that captured a
    * [[PairGraph]] and keeps using it after 16+ NEWER dataset
    * registrations in the same session will hit missing-block
    * failures, not a silent recompute. Consume a graph within the
    * query that fetched it (every caller in this repo re-fetches via
    * [[graph]]/[[pairs]], which is a map hit while the entry is live
    * and a rebuild after eviction); never stash a PairGraph across
    * unrelated dataset registrations. Deferred frees (weak-reference
    * drain) were considered and rejected: they would let evicted
    * corpus-sized checkpoints linger unreclaimed for a GC cycle —
    * the exact storage leak the bound exists to prevent.
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
      val shPlan = Dedup.shingled(docs, idCol, textCol)
      // gate the verify-broadcast BEFORE the checkpoint: the
      // pre-checkpoint plan carries the parquet-derived size estimate
      val fit = Dedup.shingleBroadcastFits(shPlan)
      val sh = shPlan.localCheckpoint(true)
      val cand = Dedup.jaccardCandidates(sh, dfCap, minShared).persist()
      val pairs = Dedup.verifyJaccard(cand, sh, threshold, Some(fit)).persist()
      PairGraph(docs.count(), cand, pairs, sh, fit)
    }

  /** The verified pair graph alone (the common consumer). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, dfCap: Int = 50, minShared: Int = 1,
      cacheKey: String): DataFrame =
    graph(docs, idCol, textCol, threshold, dfCap, minShared, cacheKey).pairs
}
