package graft

import org.apache.spark.sql.functions._

import graft.text.QualityRules

/** Shape checks for the Gopher-style repetition rules (exact values are
  * pinned by the DuckDB oracle on text_gopher_quality).
  */
class QualityRulesSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val out =
    QualityRules.repetitionStats(docs, "doc_id", "text").cache()

  test("fractions are in [0,1] and dup <= 1 - 1/n for docs with bigrams") {
    assert(out.where(col("dup_bigram_frac") < 0 ||
      col("dup_bigram_frac") > 1 || col("top_bigram_frac") < 0 ||
      col("top_bigram_frac") > 1).count() === 0)
    // top bigram can never be rarer than 1/n_bigrams (fp tolerance: the
    // fraction is a rounded double)
    assert(out.where(col("n_bigrams") > 0 &&
      col("top_bigram_frac") * col("n_bigrams") < lit(1) - lit(1e-9))
      .count() === 0)
  }

  test("keep flag matches the documented rule re-derived from the columns") {
    val rederived = out.where(
      col("keep") =!= (col("n_words").between(20, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("dup_bigram_frac") < 0.05 && col("top_bigram_frac") < 0.06))
    assert(rederived.count() === 0)
  }

  test("a pathological repeated document is flagged, a diverse one is not") {
    import spark.implicits._
    val synth = Seq(
      (1L, ("spam ham " * 40).trim),
      (2L, (1 to 80).map(i =>
        s"word${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}")
        .mkString(" "))
    ).toDF("doc_id", "text")
    val r = QualityRules.repetitionStats(synth, "doc_id", "text")
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!r(1L), "repeated bigram doc must fail the rules")
    assert(r(2L), "diverse doc must pass the rules")
  }
}
