package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random negative sampling for contrastive training:
  * per anchor, k pseudo-random corpus partners whose label differs
  * from the anchor's (the unbiased-negative counterpart of
  * [[Similarity.hardNegatives]] — random negatives train the bulk of
  * the contrast, hard negatives sharpen the margin).
  *
  * Randomness is a seedless cross-engine hash stream: draw j for
  * anchor a maps to `md5(a # j)` hex prefix -> 60-bit int -> mod N
  * (the repo's standard DuckDB-parity construction — Spark `conv(hex,
  * 16, 10)` == DuckDB `CAST('0x'||hex AS BIGINT)`), so the exact
  * sample reproduces across runs, retries and engines with no RNG
  * state. Self-draws, same-label draws and hash-collision repeats are
  * discarded; `oversample` extra draws absorb the loss (caller sizes
  * it so P(fewer than k survivors) is negligible for their label
  * skew).
  *
  * Scale shape: work is anchors x (k + oversample) rows — never
  * corpus-sized. The only corpus touch is the label-lookup equi join,
  * with the DRAW side broadcast (anchors are a bounded batch; the
  * corpus is the 100 TB side and is scanned once). Requires dense ids
  * [0, N) — the `pipeline_stable_ids` densification is the upstream
  * for non-dense corpora.
  */
object NegativeSample {

  def randomNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      oversample: Int = 11, labelCol: String = "label"): DataFrame = {
    require(k >= 1 && oversample >= 0)
    import org.apache.spark.sql.expressions.Window
    val n = corpus.agg(count(lit(1)).cast("long").as("_n"))
    val draws = anchors
      .select(col("vec_id").as("aid"), col(labelCol).as("_albl"))
      .crossJoin(broadcast(n))
      .select(col("aid"), col("_albl"),
        explode(sequence(lit(0), lit(k + oversample - 1))).as("j"),
        col("_n"))
      .withColumn("cid", pmod(
        conv(substring(md5(concat_ws("#", col("aid"), col("j"))), 1, 15),
          16, 10).cast("long"),
        col("_n")))
      .where(col("cid") =!= col("aid"))
    val kept = broadcast(draws)
      .join(corpus.select(col("vec_id").as("cid"),
        col(labelCol).as("_clbl")), Seq("cid"))
      .where(col("_clbl") =!= col("_albl"))
      .groupBy("aid", "cid")
      .agg(min("j").as("_jmin"))
    kept
      .withColumn("rank", row_number().over(
        Window.partitionBy("aid").orderBy(col("_jmin"))))
      .where(col("rank") <= k)
      .select(col("aid").as("vec_id"), col("cid").as("neg_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
  }
}
