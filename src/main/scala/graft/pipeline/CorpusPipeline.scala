package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.text.{Stopwords, TextOps}

/** End-to-end training-data preparation: the composition a 100 TB
  * corpus actually runs, built entirely from the engine's operators —
  *
  *   language filter -> quality filter (token count, stopword ratio)
  *   -> exact dedup -> near-dedup survivors (MinHash-LSH + connected
  *   components) -> token accounting
  *
  * Every stage is a DataFrame -> DataFrame transform; `prepare` returns
  * the cleaned corpus and `funnel` the per-stage row counts (the
  * observability a data pipeline needs to explain where documents
  * went).
  */
object CorpusPipeline {

  final case class Config(
    langs: Seq[String] = Seq("en"),
    minTokens: Int = 10,
    maxStopRatio: Double = 0.6,
    dedupThreshold: Double = 0.5)

  private def withQuality(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val stop = Stopwords.english
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio",
        size(filter(toks, t => t.isin(stop.map(s => s: Any): _*))).cast("double") /
          greatest(size(toks), lit(1)).cast("double"))
  }

  def languageFiltered(docs: DataFrame, cfg: Config): DataFrame =
    docs.where(col("lang").isin(cfg.langs: _*))

  def qualityFiltered(docs: DataFrame, cfg: Config): DataFrame =
    withQuality(docs)
      .where(col("n_tokens") >= cfg.minTokens &&
        col("stop_ratio") <= cfg.maxStopRatio)
      .drop("n_tokens", "stop_ratio")

  def exactDeduped(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  def nearDeduped(docs: DataFrame, cfg: Config): DataFrame =
    Dedup.survivors(docs, "doc_id", "text", cfg.dedupThreshold)

  /** The cleaned corpus. */
  def prepare(docs: DataFrame, cfg: Config = Config()): DataFrame =
    nearDeduped(exactDeduped(qualityFiltered(
      languageFiltered(docs, cfg), cfg)), cfg)

  /** Stage funnel: rows surviving each stage plus the token budget of
    * the final corpus.
    */
  def funnel(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lang = languageFiltered(docs, cfg)
    // counting every stage would recompute each prefix; cache the two
    // reused frontiers for the duration of the funnel
    val quality = qualityFiltered(lang, cfg).persist()
    val exact = exactDeduped(quality).persist()
    val near = nearDeduped(exact, cfg)
    val Array(nearCount, tokenBudget) = near
      .agg(count(lit(1)), sum(TextOps.tokenCount(col("text")).cast("long")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val out = Seq(
      ("1_input", docs.count(), 0L),
      ("2_language", lang.count(), 0L),
      ("3_quality", quality.count(), 0L),
      ("4_exact_dedup", exact.count(), 0L),
      ("5_near_dedup", nearCount, tokenBudget))
      .toDF("stage", "n_docs", "total_tokens")
    quality.unpersist()
    exact.unpersist()
    out
  }
}
