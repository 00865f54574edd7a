package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trigram language model with stupid backoff (Brants et al. 2007,
  * "Large Language Models in Machine Translation") — the CCNet-style
  * perplexity filter at its standard strength: score held-out text
  * against corpus n-gram statistics and keep/bucket documents by how
  * natural the model finds them. (The unigram proxy lives in
  * `text_unigram_logprob`; this is the full conditional-probability
  * version whose backoff chain is what production quality filters run.)
  *
  * Scale shape:
  *  - Training is three hash aggregations over one tokenize pass
  *    (trigram / bigram / unigram counts) plus two collected scalars
  *    (token total, vocab size). Count tables are VOCABULARY-scale,
  *    not corpus-scale, and get no broadcast hint — a web-scale
  *    n-gram table is not small, and AQE broadcasts when it is.
  *  - Scoring never joins the token-event stream against the counts:
  *    events collapse to per-doc trigram TYPES first (`groupBy` with a
  *    multiplicity column), the distinct type table is scored once
  *    (5 equi-joins over types-sized data), and doc scores are a
  *    weighted aggregation of type scores. Types << events on any
  *    natural-language corpus, and the expensive side of every join
  *    shrinks before it shuffles.
  *  - All probability arithmetic is plain codegen'd column math; the
  *    backoff CASE keeps MLE ratios at each level (trigram ->
  *    0.4 * bigram -> 0.16 * add-one unigram), so the score chain is
  *    reproducible in ANSI SQL (the DuckDB oracle replays it exactly).
  */
object NgramLm {

  /** alpha = 0.4 is the published stupid-backoff constant. */
  val Alpha = 0.4

  /** Trained model: count tables plus the two scalars. `uni` doubles
    * as the vocabulary (one row per training-corpus word).
    */
  final case class TrigramLm(tri: DataFrame, big: DataFrame,
      uni: DataFrame, nTokens: Long, vocab: Long)

  /** Adjacent-pair structs of a token array (pmi's zip_with pattern). */
  private def bigramsCol(ws: Column): Column =
    when(size(ws) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))

  /** Adjacent-triple structs: two nested zip_withs over three slices. */
  private def trigramsCol(ws: Column): Column =
    when(size(ws) < 3,
        array().cast("array<struct<w1:string,w2:string,w3:string>>"))
      .otherwise(zip_with(
        zip_with(slice(ws, lit(1), size(ws) - 2), slice(ws, lit(2), size(ws) - 2),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
        slice(ws, lit(3), size(ws) - 2),
        (p, c) => struct(p.getField("w1").as("w1"),
          p.getField("w2").as("w2"), c.as("w3"))))

  /** Train on a frame holding a token-array column `wsCol`: three
    * count aggregations + two scalars, nothing corpus-sized retained.
    */
  def train(toks: DataFrame, wsCol: String = "ws"): TrigramLm = {
    val ws = col(wsCol)
    val tri = toks.select(explode(trigramsCol(ws)).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))
    val big = toks.select(explode(bigramsCol(ws)).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val uni = toks.select(explode(ws).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val Array(n, v) = uni.agg(sum("c1"), count(lit(1))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    TrigramLm(tri, big, uni, n, v)
  }

  /** Per-document mean trigram log-probability under the model.
    * Output: (idCol, n_tri, avg_logprob), docs with >= 3 tokens only.
    * Perplexity is exp(-avg_logprob) — monotone, so filters threshold
    * the logprob directly.
    */
  def score(docsToks: DataFrame, lm: TrigramLm, idCol: String = "doc_id",
      wsCol: String = "ws"): DataFrame = {
    // events -> per-doc trigram types with multiplicity; the type
    // table (not the event stream) is what gets scored
    val docTri = docsToks
      .select(col(idCol), explode(trigramsCol(col(wsCol))).as("t"))
      .groupBy(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .agg(count(lit(1)).as("m"))
    val types = docTri.select("w1", "w2", "w3").distinct()

    val c3 = lm.tri
    val p12 = lm.big.select(col("w1").as("p1"), col("w2").as("p2"),
      col("c2").as("c12"))
    val s23 = lm.big.select(col("w1").as("s2"), col("w2").as("s3"),
      col("c2").as("c23"))
    val u2 = lm.uni.select(col("w").as("uw2"), col("c1").as("cu2"))
    val u3 = lm.uni.select(col("w").as("uw3"), col("c1").as("cu3"))

    val denom = lit(lm.nTokens.toDouble + lm.vocab.toDouble)
    val lp = log(
      when(col("c3").isNotNull,
          col("c3").cast("double") / col("c12"))
        .when(col("c23").isNotNull,
          lit(Alpha) * col("c23").cast("double") / col("cu2"))
        .otherwise(lit(Alpha * Alpha) *
          (coalesce(col("cu3"), lit(0L)) + lit(1)) / denom))

    val scored = types
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(p12, col("w1") === col("p1") && col("w2") === col("p2"), "left")
      .join(s23, col("w2") === col("s2") && col("w3") === col("s3"), "left")
      .join(u2, col("w2") === col("uw2"), "left")
      .join(u3, col("w3") === col("uw3"), "left")
      .select(col("w1"), col("w2"), col("w3"), lp.as("lp"))

    docTri.join(scored, Seq("w1", "w2", "w3"))
      .groupBy(idCol)
      .agg(sum("m").as("n_tri"),
        round(sum(col("m") * col("lp")) / sum("m"), 4).as("avg_logprob"))
      .orderBy(idCol)
  }
}
