package graft

/** The distributed midrank AUC must equal the textbook driver-side
  * computation (ties included) on the real corpus.
  */
class AucSpec extends SparkSpec {

  test("stats_auc == driver-side Mann-Whitney midrank AUC") {
    val got = graft.queries.StatsExtra.statsAuc(spark, sfDir)
      .collect()(0)
    val rows = graft.queries.TextQueries.qualityScore(spark, sfDir)
      .join(Tables(spark, sfDir, "documents").select("doc_id", "lang"),
        "doc_id")
      .select("quality_logit", "lang")
      .collect().map(r => (r.getDouble(0), r.getString(1) == "en"))
    val sorted = rows.sortBy(_._1)
    // midranks with tie averaging
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val mid = (i + 1 + j).toDouble / 2 // avg of ranks i+1..j
      (i until j).foreach(k => ranks(k) = mid)
      i = j
    }
    val nPos = sorted.count(_._2).toDouble
    val nNeg = sorted.length - nPos
    val rPos = sorted.zip(ranks).filter(_._1._2).map(_._2).sum
    val want = BigDecimal((rPos - nPos * (nPos + 1) / 2) / (nPos * nNeg))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == nPos.toLong && got.getLong(1) == nNeg.toLong)
    assert(got.getDouble(2) == want,
      s"distributed AUC ${got.getDouble(2)} != driver $want")
    // the synthetic corpus draws all langs from the same token model,
    // so discriminative power is ~chance here (0.49 measured) — the
    // pin is the RANK MECHANICS, which the oracle checks bit-exactly
    assert(got.getDouble(2) > 0.0 && got.getDouble(2) < 1.0)
  }
}
