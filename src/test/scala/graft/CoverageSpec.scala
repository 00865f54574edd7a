package graft

import graft.queries.Coverage

class CoverageSpec extends SparkSpec {

  test("approx_count_distinct tracks exact within its error bound") {
    val rows = Coverage.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }

  test("tfidf ranks are dense 1..3 per doc") {
    val rows = Coverage.tfidfTop(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getLong(3)).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("sliding windows cover each event twice") {
    val n = Tables(spark, sfDir, "events").count()
    val winSum = Coverage.slidingWindow(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    assert(winSum == 2 * n)
  }
}
