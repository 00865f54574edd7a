package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Pins for the DSIR importance-weighting operator. The registered
  * unigram query is fully oracle-checked by the driver; these cover
  * the properties the oracle can't: the bigram feature path (checked
  * against a driver-side brute force of the same model) and the
  * direction of the weights (target-slice docs must score higher on
  * average than off-target docs — the entire point of DSIR).
  */
class DsirSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")

  /** Driver-side brute force of the hashed-ngram importance model. */
  private def brute(rows: Seq[(Long, Boolean, Seq[String])], m: Int)
      : Map[Long, Double] = {
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % m
    }
    val feats = rows.map { case (id, t, ws) => (id, t, ws.map(bucket)) }
    val ct = new scala.collection.mutable.HashMap[Long, Long]()
    val cr = new scala.collection.mutable.HashMap[Long, Long]()
    for ((_, t, bs) <- feats; b <- bs) {
      if (t) ct(b) = ct.getOrElse(b, 0L) + 1
      cr(b) = cr.getOrElse(b, 0L) + 1
    }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def lr(b: Long): Double =
      math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + m.toDouble)) -
        math.log((cr.getOrElse(b, 0L) + 1.0) / (tr + m.toDouble))
    feats.map { case (id, _, bs) =>
      id -> BigDecimal(bs.map(lr).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("bigram feature path matches a driver-side brute force") {
    import spark.implicits._
    val data = Seq(
      (1L, "the quick brown fox jumps", "en"),
      (2L, "the quick brown dog sleeps", "en"),
      (3L, "le renard brun rapide saute", "fr"),
      (4L, "quick quick the the fox", "en"),
      (5L, "der schnelle braune fuchs", "de"))
    val df = data.toDF("doc_id", "text", "lang")
    val got = Dsir.importanceWeights(df, col("lang") === "en",
        m = 8, ngram = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = data.map { case (id, text, lang) =>
      val toks = text.split(" ").toSeq
      val bigrams = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
      (id, lang == "en", toks ++ bigrams)
    }
    val want = brute(rows, m = 8)
    assert(got.keySet == want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: got ${got(id)} want $w")
  }

  test("target-slice documents outscore off-target documents on average") {
    val w = Dsir.importanceWeights(docs, col("lang") === "en", m = 64)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("logw").as("mean_w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"target mean ${w(true)} should exceed off-target mean ${w(false)}")
  }

  test("target == raw corpus => every weight is exactly zero") {
    // when the target slice IS the whole corpus, ct == cr and tt == tr
    // per bucket, so each log-ratio is a difference of identical IEEE
    // doubles — exactly 0.0, not approximately
    val w = Dsir.importanceWeights(docs, lit(true), m = 16)
      .select("logw").distinct().collect().map(_.getDouble(0)).toSeq
    assert(w == Seq(0.0), s"nonzero weights under identity target: $w")
  }

  test("select keeps the k highest-weight docs, deterministically") {
    val a = Dsir.select(docs, col("lang") === "en", k = 10)
      .collect().map(_.getLong(0)).toSeq
    val b = Dsir.select(docs, col("lang") === "en", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.length == 10)
  }
}
