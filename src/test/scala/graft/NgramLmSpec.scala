package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Pins the stupid-backoff arithmetic on a hand-computable corpus (the
  * registered query `text_trigram_logprob` is oracle-checked at corpus
  * scale; this pins WHICH backoff level fires and its exact value).
  */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // train corpus: one doc, tokens "a b c a b d"
  // trigrams: abc bca cab abd; bigrams: ab bc ca ab bd; N=6, V=4
  private lazy val lm = NgramLm.train(
    Seq(Seq("a", "b", "c", "a", "b", "d")).toDF("ws"))

  private def scoreOf(tokens: Seq[String]): Map[(Long, Long), Double] = {
    val out = NgramLm.score(
      Seq((1L, tokens)).toDF("doc_id", "ws"), lm).collect()
    out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("training scalars: token total and vocab size") {
    assert(lm.nTokens === 6L)
    assert(lm.vocab === 4L)
  }

  test("seen trigram scores at the trigram MLE c3/c12") {
    // doc "a b c": one trigram (a,b,c), c3=1, c(ab)=2 -> ln(0.5)
    val s = scoreOf(Seq("a", "b", "c"))
    assert(s((1L, 1L)) === math.rint(math.log(0.5) * 1e4) / 1e4)
  }

  test("unseen trigram with seen (w2,w3) bigram backs off at alpha") {
    // doc "d a b": trigram (d,a,b) unseen; bigram (a,b) c=2, c(a)=2
    // -> 0.4 * 2/2 = 0.4
    val s = scoreOf(Seq("d", "a", "b"))
    assert(s((1L, 1L)) === math.rint(math.log(0.4) * 1e4) / 1e4)
  }

  test("unseen bigram falls to the add-one unigram floor") {
    // doc "b d a": trigram (b,d,a) unseen, bigram (d,a) unseen,
    // c(a)=2 -> 0.16 * (2+1)/(6+4) = 0.048
    val s = scoreOf(Seq("b", "d", "a"))
    assert(s((1L, 1L)) === math.rint(math.log(0.048) * 1e4) / 1e4)
  }

  test("OOV word floors at 0.16/(N+V) and docs under 3 tokens drop") {
    // doc "a b c x": (a,b,c) seen ln(.5); (b,c,x): bigram (c,x) unseen,
    // x OOV -> 0.16 * 1/10; avg of the two logs
    val s = scoreOf(Seq("a", "b", "c", "x"))
    val expected =
      math.rint((math.log(0.5) + math.log(0.016)) / 2 * 1e4) / 1e4
    assert(s((1L, 2L)) === expected)
    assert(scoreOf(Seq("a", "b")).isEmpty)
  }

  test("multiplicity weights: repeated trigram counts per occurrence") {
    // doc "a b c a b c a b c" has trigram events: abc,bca,cab,abc,bca,
    // cab,abc — 7 events, abc x3 (ln .5), bca x2 (c3=1,c(bc)=1 -> ln 1),
    // cab x2 (c3=1, c(ca)=1 -> ln 1)
    val s = scoreOf(Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"))
    val expected = math.rint(3 * math.log(0.5) / 7 * 1e4) / 1e4
    assert(s((1L, 7L)) === expected)
  }

  test("held-out corpus query scores only odd docs, all backoff levels fire") {
    val out = graft.queries.TextQueries.trigramLogprob(spark, sfDir)
      .cache()
    assert(out.where(pmod(col("doc_id"), lit(2)) === 0).count() === 0)
    assert(out.count() > 0)
    // every score is a genuine log-probability: strictly negative
    assert(out.where(col("avg_logprob") >= 0).count() === 0)
  }
}
