package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET distribution than
  * under the RAW corpus distribution, then resample the highest-weight
  * documents. The standard "make the web corpus look like the
  * high-quality target" selection step of an LLM data pipeline.
  *
  * Model: token n-grams hash into `m` buckets; target and raw bucket
  * distributions are add-one-smoothed multinomials; a document's log
  * importance weight is
  *
  *   log w(d) = sum_b n_{d,b} * (log p_target(b) - log p_raw(b))
  *
  * Scale shape (the part that must survive 100 TB): ONE tokenize pass
  * builds the per-(doc, bucket) count table — `docs x m` rows, hash
  * partitioned, never wider than the token explode it aggregates
  * map-side. Both bucket distributions derive from a second agg over
  * that SMALL table, collected once (m rows); the per-bucket log-ratio
  * is an m-row literal broadcast-joined back, and the final weight is
  * one partial+final agg by doc_id. The corpus text is read exactly
  * once; nothing corpus-sized is collected (m rows, fixed up front).
  *
  * The bucket hash is the cross-engine recipe shared with
  * text_hashed_features: first 7 hex digits of md5, so DuckDB can
  * replay the whole computation (`CAST('0x'||substr(md5(w),1,7) AS
  * BIGINT) % m`) and the registered query is hash-checked, not
  * rows-only.
  *
  * `ngram = 2` adds adjacent-token bigrams to the feature stream
  * (the paper's default); the registered query uses unigrams so the
  * oracle SQL stays a plain unnest — the bigram path is pinned by
  * DsirSpec against a driver-side brute force.
  */
object Dsir {

  /** md5-prefix feature hash bucket, identical in Spark and DuckDB. */
  private def bucket(c: Column, m: Int): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long") % m

  /** Token (+ optional bigram) feature stream: (doc_id, is_target, w). */
  private def features(docs: DataFrame, targetPred: Column,
      ngram: Int): DataFrame = {
    require(ngram == 1 || ngram == 2, s"ngram must be 1 or 2 (got $ngram)")
    val toks = TextOps.tokens(col("text"))
    // zip_with pads the shorter side with null; concat_ws drops the
    // null so the pad element has no space — the instr filter removes it
    val feats =
      if (ngram == 1) toks
      else concat(toks, filter(
        zip_with(toks, slice(toks, 2, 2147483646),
          (a, b) => concat_ws(" ", a, b)),
        x => instr(x, " ") > 0))
    docs.select(col("doc_id"), targetPred.as("_t"), explode(feats).as("w"))
  }

  /** Per-document log importance weight against the target slice.
    * Output: (doc_id, n_tokens, logw) for every document with at least
    * one token, logw rounded at 4 (the cross-engine float discipline
    * every LM-scoring query here uses). Higher = more target-like.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      m: Int = 64, ngram: Int = 1): DataFrame = {
    // ONE corpus tokenize pass -> per-(doc, bucket) counts. The
    // checkpoint is the multi-consumer barrier: the m-row distribution
    // agg and the final weight join both read this table, not the
    // corpus (same discipline as the trigram-LM memo).
    val docB = features(docs, targetPred, ngram)
      .groupBy(col("doc_id"), col("_t"), bucket(col("w"), m).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // the m-row bucket distribution collects ONCE and the per-bucket
    // log-ratio becomes a literal local relation — the previous shape
    // (scalar collect over perB, then a second perB aggregation inside
    // the weight job for the join) re-aggregated the checkpointed
    // count table twice. StrictMath.log on the driver, matching the
    // executor-side Log expression the previous shape evaluated, so
    // the weights stay bit-identical across JVMs/platforms (Math.log
    // is only 1-ulp-accurate and intrinsic-dependent).
    val perB = docB.groupBy("bucket").agg(
      sum(when(col("_t"), col("n")).otherwise(0L)).as("ct"),
      sum("n").as("cr")).collect()
    val tt = perB.map(_.getLong(1)).sum
    val tr = perB.map(_.getLong(2)).sum
    val lrRows = perB.toSeq.map { r =>
      (r.getLong(0),
        StrictMath.log((r.getLong(1) + 1.0) / (tt + m.toDouble)) -
          StrictMath.log((r.getLong(2) + 1.0) / (tr + m.toDouble)))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val lr = lrRows.toDF("bucket", "lr")
    docB
      .join(broadcast(lr), "bucket") // m rows: always broadcastable
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"),
        round(sum(col("n") * col("lr")), 4).as("logw"))
  }

  /** The resampling step: keep the `k` highest-weight documents
    * (deterministic top-k — the paper's Gumbel noise is for sampling
    * diversity; rank selection is its tau->0 limit). Executes as
    * TakeOrderedAndProject over the weight table, never a global sort.
    */
  def select(docs: DataFrame, targetPred: Column, k: Int,
      m: Int = 64, ngram: Int = 1): DataFrame =
    importanceWeights(docs, targetPred, m, ngram)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)
}
