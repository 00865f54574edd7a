package graft

/** The distributed two-sample KS distance must equal the textbook
  * driver-side computation on the real corpus, and PSI must be
  * non-negative (it is a sum of (p-q)ln(p/q) terms, each >= 0 iff
  * p,q ordered consistently — the metric is a Jeffreys divergence,
  * always >= 0).
  */
class DriftSpec extends SparkSpec {

  test("stats_ks_drift == driver-side exact two-sample KS") {
    val got = graft.queries.StatsExtra.statsKsDrift(spark, sfDir)
      .collect()(0)
    val rows = graft.queries.TextQueries.qualityScore(spark, sfDir)
      .join(Tables(spark, sfDir, "documents").select("doc_id", "lang"),
        "doc_id")
      .select("quality_logit", "lang")
      .collect().map(r => (r.getDouble(0), r.getString(1) == "en"))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    val xs = (a ++ b).distinct.sorted
    def cdf(v: Array[Double], x: Double) =
      v.count(_ <= x).toDouble / v.length
    val want = xs.map(x => math.abs(cdf(a, x) - cdf(b, x))).max
    assert(got.getLong(0) == a.length && got.getLong(1) == b.length)
    assert(math.abs(got.getDouble(2) - want) < 1e-12,
      s"distributed KS ${got.getDouble(2)} != driver $want")
  }

  test("psi is non-negative and finite") {
    val r = graft.queries.StatsExtra.statsPsiDrift(spark, sfDir)
      .collect()(0)
    val psi = r.getDouble(1)
    assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite, s"psi=$psi")
    assert(r.getLong(0) > 0)
  }
}
