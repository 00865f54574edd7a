package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Bpe, EmbPca, LloydKMeans, WordPiece}

/** Tokenizer-training and corpus-clustering readouts — the two
  * iterative training loops a data-prep engine runs on top of the
  * static pipeline (both deterministic; golden-hash pinned since no
  * SQL oracle can express the iteration).
  */
object TrainingQueries {

  /** The 20- and 30-merge vocabulary tables from ONE training run per
    * dataset (greedy BPE is prefix-deterministic, see
    * [[Bpe.trainSnapshots]]) — the vocab and encoder profiles were
    * measured re-running the whole per-round job ladder each.
    */
  private val bpeCache =
    new graft.SessionMemo[(Seq[(String, String)], Map[Int, DataFrame])](8)(
      v => v._2.valuesIterator.foreach(graft.SessionMemo.free))
  private def bpeTrained(spark: SparkSession, dir: String)
      : (Seq[(String, String)], Map[Int, DataFrame]) =
    bpeCache.getOrElseUpdate(spark, dir) {
      Bpe.trainSnapshots(Tables(spark, dir, "documents"), "text",
        Seq(20, 30))
    }

  /** BPE subword vocabulary after 30 merges over the documents corpus:
    * corpus-weighted token occurrences for the top 40 subwords.
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    Bpe.vocabProfileFrom(bpeTrained(spark, dir)._2(30), topK = 40)

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

  /** Distributed logistic-regression training readout
    * ([[graft.operators.LogReg]]): recover a linear teacher
    * (y = e1 + e2 - e3 > 0 — the synthetic labels are NOT linearly
    * separable in embedding space, so the optimizer check uses a
    * recoverable target) with 30 full-batch GD rounds, then report the
    * confusion profile per true class plus the final training loss.
    * Deterministic (zero init, fixed schedule); golden-pinned like the
    * other iterative trainers.
    */
  import org.apache.spark.sql.Column

  /** The linear-teacher label shared by the logreg queries: y = e1 +
    * e2 - e3 > 0 (recoverable target; the synthetic labels are NOT
    * linearly separable in embedding space).
    */
  private[graft] def teacherLabel: Column = {
    import org.apache.spark.sql.functions._
    (element_at(col("embedding"), 1) + element_at(col("embedding"), 2)
      - element_at(col("embedding"), 3)) > 0
  }

  /** One trained logreg model per (session, dir), shared by the eval
    * and calibration readouts (training is 30 full scans — the
    * expensive artifact; both consumers read the same deterministic
    * weights, so the memo changes cost, never content).
    */
  private val logregCache =
    new graft.SessionMemo[graft.operators.LogReg.Model](8)(_ => ())
  private def logregModel(spark: SparkSession, dir: String)
      : graft.operators.LogReg.Model =
    logregCache.getOrElseUpdate(spark, dir) {
      graft.operators.LogReg.fit(Tables(spark, dir, "embeddings"),
        teacherLabel, iters = 30, lr = 10.0, layoutKey = Some("vec_id"))
    }

  def logregEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftx.RoundAwayFromZero
    val emb = Tables(spark, dir, "embeddings")
    val m = logregModel(spark, dir)
    graft.operators.LogReg.score(emb, m)
      .groupBy(teacherLabel.as("y_true"))
      .agg(count(lit(1)).as("n"),
        sum((col("prob") >= 0.5).cast("long")).as("n_pred_pos"),
        RoundAwayFromZero.column(avg("prob"), 4).as("avg_prob"))
      .withColumn("final_loss",
        RoundAwayFromZero.column(lit(m.losses.last), 4))
      .orderBy("y_true")
  }

  /** Classifier calibration (reliability diagram): predicted
    * probabilities cut into 10 fixed-width bins, mean predicted prob vs
    * empirical positive rate per bin — the readout that decides
    * whether a quality classifier's scores can gate thresholds
    * directly or need recalibration. One scan over the scored frame
    * (scoring is codegen inference), one 10-key hash agg.
    */
  def logregCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, dir, "embeddings")
    val m = logregModel(spark, dir)
    graft.operators.LogReg.score(emb, m)
      .select(teacherLabel.cast("long").as("y"), col("prob"),
        least(floor(col("prob") * 10).cast("long"), lit(9L)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(avg("prob"), 4).as("avg_prob"),
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(avg(col("y").cast("double")), 4).as("frac_pos"))
      .orderBy("bin")
  }

  /** Multivariate embedding-space outlier scoring
    * ([[graft.operators.EmbPca.mahalanobis]]): the 20 most anomalous
    * vectors by squared Mahalanobis distance under the corpus' own
    * covariance — the filter that catches off-manifold embeddings
    * (encoder glitches, corrupt inputs) that no per-dimension z-score
    * sees. One moments pass (the PCA fit) + one codegen scoring scan
    * ending in TakeOrdered; golden-pinned (driver eigensolve is not
    * SQL-expressible).
    */
  def mahalanobisOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, dir, "embeddings")
    val model = EmbPca.fit(emb, layoutKey = Some("vec_id"))
    EmbPca.mahalanobis(emb, model)
      .select(col("vec_id"),
        // away-from-zero = DuckDB round, the oracle's rounding
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(col("m2"), 4).as("m2"))
      .orderBy(col("m2").desc, col("vec_id"))
      .limit(20)
  }

  /** Tokenizer application: per-document subword counts + fertility
    * under a 20-merge BPE vocabulary ([[Bpe.encodeProfile]]) — the
    * sequence-length profile that sizes packing and context windows
    * once a real tokenizer replaces whitespace counting.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    // prefix determinism: the first 20 merges of the 30-merge run ARE
    // the 20-merge model, so the unseen-word fallback uses take(20)
    val (merges, snaps) = bpeTrained(spark, dir)
    Bpe.encodeProfileFrom(Tables(spark, dir, "documents"), "doc_id", "text",
      snaps(20), merges.take(20))
  }

  /** One WordPiece model per (session, dir), shared by the vocab and
    * encoder profiles — same memo rationale as [[bpeWords]].
    */
  private val wpCache =
    new graft.SessionMemo[(WordPiece.Model, DataFrame)](8)(
      v => graft.SessionMemo.free(v._2))
  private def wpModel(spark: SparkSession, dir: String)
      : (WordPiece.Model, DataFrame) =
    wpCache.getOrElseUpdate(spark, dir) {
      WordPiece.train(Tables(spark, dir, "documents"), "text",
        nMerges = 30)
    }

  /** WordPiece subword vocabulary after 30 likelihood-ratio merges:
    * corpus-weighted occurrence totals for the top 40 pieces
    * (##-prefixed continuations distinct from word-initial pieces).
    */
  def wordpieceVocab(spark: SparkSession, dir: String): DataFrame =
    WordPiece.vocabProfile(wpModel(spark, dir)._2, topK = 40)

  /** Tokenizer application: per-document greedy longest-match-first
    * encoding stats under the trained WordPiece vocab — word/subword/
    * OOV counts + fertility (the BERT tokenizer readout).
    */
  def wordpieceEncode(spark: SparkSession, dir: String): DataFrame = {
    val (model, types) = wpModel(spark, dir)
    WordPiece.encodeProfile(Tables(spark, dir, "documents"),
      "doc_id", "text", model, types)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_vocab" -> bpeVocab,
    "text_bpe_encode" -> bpeEncode,
    "text_wordpiece_vocab" -> wordpieceVocab,
    "text_wordpiece_encode" -> wordpieceEncode,
    "emb_kmeans_stats" -> kmeansStats,
    "emb_pca_variance" -> pcaVariance,
    "emb_logreg_eval" -> logregEval,
    "emb_logreg_calibration" -> logregCalibration,
    "emb_mahalanobis_outliers" -> mahalanobisOutliers)

  // round-7 conversions: the BPE and WordPiece trainers are integer
  // algorithms, so their merge loops replay as unrolled SQL rounds —
  // see TrainerOracle for the machinery
  val oracle: Map[String, String] = Map(
    "text_bpe_vocab" -> TrainerOracle.bpeVocab,
    "text_bpe_encode" -> TrainerOracle.bpeEncode,
    "text_wordpiece_vocab" -> TrainerOracle.wordpieceVocab,
    "text_wordpiece_encode" -> TrainerOracle.wordpieceEncode,
    // round-10 conversions via the baked-artifact seam: final trained
    // models baked (KmeansBakedData / ModelBakedData), everything
    // downstream replayed — see KmeansOracle / ModelOracle
    "emb_kmeans_stats" -> KmeansOracle.kmeansStats,
    "emb_logreg_eval" -> ModelOracle.logregEval,
    "emb_logreg_calibration" -> ModelOracle.logregCalibration,
    "emb_mahalanobis_outliers" -> ModelOracle.mahalanobisOutliers,
    // round-12 conversion: the raw spectrum baked, the variance
    // readout (trace, ratios, prefix cumsums, rint rounding) replayed
    "emb_pca_variance" -> ModelOracle.pcaVariance)
}
