package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition and shape rules for corpus quality filtering
  * (Rae et al. 2021 §A1.1, public): word-count bounds, mean word length
  * band, and duplicate / most-common n-gram fractions. Documents failing
  * the rules are flagged, not dropped — the downstream pipeline decides.
  *
  * Scale posture (100 TB): word-level stats are row-local (one projection
  * off the scan). The bigram fractions need per-(doc, bigram) counts —
  * two hash aggregations keyed on (doc_id, bigram) then doc_id, both
  * map-side combining, no window over any global ordering. The final
  * assembly is an equi-join on doc_id.
  */
object QualityRules {

  /** Per-document repetition statistics + keep flag.
    * Output: (doc_id, n_words, mean_word_len, n_bigrams,
    * dup_bigram_frac, top_bigram_frac, keep).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 100000,
      maxDupBigramFrac: Double = 0.05, maxTopBigramFrac: Double = 0.06,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0)
      : DataFrame = {
    // Materialization barrier: tokenize once before per-bigram fan-out.
    val toked = docs
      .select(col(idCol).as("_id"), TextOps.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .repartition(col("_id"))

    val base = toked.select(
      col("_id"),
      size(col("_toks")).cast("long").as("n_words"),
      (length(array_join(col("_toks"), "")).cast("double") /
        size(col("_toks")).cast("double")).as("mean_word_len"))

    val bigrams = toked
      .where(size(col("_toks")) >= 2)
      .select(col("_id"), explode(transform(
        sequence(lit(1), size(col("_toks")) - 1),
        i => concat(element_at(col("_toks"), i), lit(" "),
          element_at(col("_toks"), i + 1)))).as("_bg"))

    val perDoc = bigrams
      .groupBy("_id", "_bg").agg(count(lit(1)).as("_c"))
      .groupBy("_id")
      .agg(sum("_c").cast("long").as("n_bigrams"),
        count(lit(1)).as("_n_distinct"),
        max("_c").cast("long").as("_top"))

    base.join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("n_words"),
        col("mean_word_len"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("n_bigrams") - col("_n_distinct"), lit(0L))
          .cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L))
            .cast("double")).as("dup_bigram_frac"),
        (coalesce(col("_top"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L))
            .cast("double")).as("top_bigram_frac"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("dup_bigram_frac") < maxDupBigramFrac &&
          col("top_bigram_frac") < maxTopBigramFrac)
  }
}
