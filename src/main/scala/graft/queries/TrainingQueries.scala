package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Bpe, EmbPca, LloydKMeans}

/** Tokenizer-training and corpus-clustering readouts — the two
  * iterative training loops a data-prep engine runs on top of the
  * static pipeline (both deterministic; golden-hash pinned since no
  * SQL oracle can express the iteration).
  */
object TrainingQueries {

  /** BPE subword vocabulary after 30 merges over the documents corpus:
    * corpus-weighted token occurrences for the top 40 subwords.
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    Bpe.vocabProfile(Tables(spark, dir, "documents"), "text",
      nMerges = 30, topK = 40)

  /** Distributed Lloyd k-means over the embeddings table: per-cluster
    * sizes and SSE after 4 full-corpus rounds (k=8).
    */
  def kmeansStats(spark: SparkSession, dir: String): DataFrame =
    LloydKMeans.clusterStats(
      Tables(spark, dir, "embeddings"), k = 8, iters = 4)

  /** PCA eigenvalue spectrum of the embedding corpus (top 8): one
    * sufficient-statistics pass + driver Jacobi eigensolve.
    */
  def pcaVariance(spark: SparkSession, dir: String): DataFrame =
    EmbPca.varianceProfile(spark, dir, topK = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_vocab" -> bpeVocab,
    "emb_kmeans_stats" -> kmeansStats,
    "emb_pca_variance" -> pcaVariance)

  val oracle: Map[String, String] = Map.empty
}
