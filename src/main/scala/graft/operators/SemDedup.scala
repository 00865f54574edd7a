package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Semantic deduplication (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", public):
  * cluster the embedding space, call two documents semantic duplicates
  * when their cosine similarity inside a cluster exceeds eps, and keep
  * ONE representative per duplicate group — by the paper's rule, the
  * member with the LOWEST similarity to its cluster centroid (highest
  * dist2), which preserves the most marginal example and discards the
  * prototypical copies.
  *
  * Scale shape (100 TB):
  *  - pair generation is an exact within-cluster self-join — the
  *    published contract: cost is sum of cluster-size^2, and the knob
  *    is k, chosen so E[cluster] stays in the low thousands (the paper
  *    runs k=110000 over 233M docs). No all-pairs over the corpus.
  *  - norms are computed once below a checkpoint barrier so both join
  *    sides reuse one exchange instead of re-deriving per side.
  *  - duplicate groups come from [[Dedup.connectedComponents]] (driver
  *    union-find under 4M edges, distributed label-prop above).
  *  - the keep rule is a max-of-struct aggregation per component
  *    (map-side combining), not a window; comparisons use dist2/cosine
  *    rounded to 6 decimals so ties break on vec_id identically in any
  *    engine (the DuckDB oracle replays the whole chain).
  *
  * The clustering is pluggable: callers pass any assigned frame
  * (id, embedding, cluster, dist2) — [[LloydKMeans.fit]] output, a
  * label column with centroid distances, or a loaded index.
  */
object SemDedup {

  /** Duplicate-pruning decision per vector. Input columns: `idCol`,
    * `embedding`, `cluster`, `dist2` (distance-to-centroid, any
    * monotone prototypicality score). Output: (idCol, cluster,
    * component, keep) — `component` is the duplicate-group id (the
    * min member id), null for vectors with no semantic duplicate;
    * `keep` marks survivors.
    */
  def prune(assigned: DataFrame, eps: Double,
      idCol: String = "vec_id"): DataFrame = {
    // one exchange feeds both self-join sides: norm below the barrier
    val base = assigned
      .select(col(idCol).as("_id"), col("cluster"), col("dist2"),
        col("embedding"), VectorOps.norm(col("embedding")).as("_nrm"))
      .localCheckpoint(true)

    val side = (n: String) => base.select(col("cluster"),
      col("_id").as(n), col("embedding").as(s"_e$n"), col("_nrm").as(s"_n$n"))
    val pairs = side("ida").join(side("idb"),
        Seq("cluster"))
      .where(col("ida") < col("idb") &&
        graft.functions.VectorOps.simRound6(VectorOps.dot(col("_eida"), col("_eidb")) /
          (col("_nida") * col("_nidb"))) >= eps)
      .select(col("ida"), col("idb"))

    val comps = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("_id"), col("component"))

    // survivor per duplicate group: max (rounded dist2, id) — least
    // prototypical member, deterministic tie-break on id
    val keepers = base.join(comps, "_id")
      .groupBy("component")
      .agg(max(struct(graft.functions.VectorOps.simRound6(col("dist2")).as("d"), col("_id").as("i")))
        .getField("i").as("_keeper"))

    base.join(comps, Seq("_id"), "left")
      .join(keepers, Seq("component"), "left")
      .select(col("_id").as(idCol), col("cluster"), col("component"),
        (col("component").isNull || col("_id") === col("_keeper"))
          .as("keep"))
  }

  /** Full SemDeDup over an embedding corpus: distributed Lloyd
    * clustering then [[prune]]. Deterministic end-to-end (content-
    * addressed init, fixed iteration count, rounded comparisons).
    */
  def dedup(corpus: DataFrame, k: Int, iters: Int, eps: Double,
      idCol: String = "vec_id"): DataFrame = {
    val (_, assigned, _) = LloydKMeans.fit(corpus, k, iters, idCol)
    prune(assigned, eps, idCol)
  }
}
