package graft

import org.apache.spark.sql.functions._

import graft.operators.ExactQuantile

/** ExactQuantile (histogram-bracket selection) must be bit-identical
  * to Spark's exact percentile aggregate — including interpolated
  * positions, duplicates, and tiny brackets that force the
  * bin-boundary pair path.
  */
class ExactQuantileSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir, "lineitem")

  test("matches percentile() on real data across quantiles") {
    for (q <- Seq(0.1, 0.25, 0.5, 0.9, 0.99)) {
      val expect = li.agg(percentile(col("l_extendedprice"), lit(q)))
        .collect()(0).getDouble(0)
      val got = ExactQuantile.quantile(li, col("l_extendedprice"), q)
      assert(got === expect, s"q=$q")
    }
  }

  test("matches percentile() when brackets are forced tiny (deep descent)") {
    for (q <- Seq(0.5, 0.75)) {
      val expect = li.agg(percentile(col("l_quantity"), lit(q)))
        .collect()(0).getDouble(0)
      // bracketLimit=8 forces many rounds incl. duplicate-heavy bins
      val got = ExactQuantile.quantile(li, col("l_quantity"), q,
        bracketLimit = 8)
      assert(got === expect, s"q=$q")
    }
  }

  test("matches percentile() on seeded random data with heavy duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(4000)(
      if (rnd.nextBoolean()) rnd.nextInt(10).toDouble // heavy dup mass
      else rnd.nextDouble() * 1000.0)
    val df = vals.toDF("x")
    for (q <- Seq(0.01, 0.3, 0.5, 0.77, 0.99)) {
      val expect = df.agg(percentile(col("x"), lit(q)))
        .collect()(0).getDouble(0)
      val got = ExactQuantile.quantile(df, col("x"), q, bracketLimit = 64)
      assert(got === expect, s"q=$q")
    }
  }

  test("knownStats skips the stats pass, result bit-identical even " +
      "with a conservative range") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(3000)(rnd.nextDouble() * 500.0 - 100.0).toDF("x")
    val r = df.agg(count(col("x")), min("x"), max("x")).collect()(0)
    val (n, lo, hi) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val self = ExactQuantile.quantile(df, col("x"), q)
      val exact = ExactQuantile.quantile(df, col("x"), q,
        knownStats = Some((n, lo, hi)))
      // a WIDER bracket only coarsens the first descent round; the
      // returned order statistics must still be the exact values
      val wide = ExactQuantile.quantile(df, col("x"), q,
        knownStats = Some((n, lo - 250.0, hi + 77.0)))
      assert(exact === self, s"q=$q exact-stats path")
      assert(wide === self, s"q=$q conservative-stats path")
    }
    // the MAD-shape derived column: same count, derived range
    val med = ExactQuantile.quantile(df, col("x"), 0.5,
      knownStats = Some((n, lo, hi)))
    val dev = abs(col("x") - lit(med))
    val madSelf = ExactQuantile.quantile(df, dev, 0.5)
    val madKnown = ExactQuantile.quantile(df, dev, 0.5,
      knownStats = Some((n, 0.0, math.max(med - lo, hi - med))))
    assert(madKnown === madSelf)
  }

  test("duplicates, odd/even counts, and exact-rank positions") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 2.0, 2.0, 3.5, 7.25, 7.25, 100.0, -4.5)
    for (nTake <- Seq(8, 9); q <- Seq(0.0, 0.25, 0.5, 1.0)) {
      val df = vals.take(nTake).toDF("x")
      val expect = df.agg(percentile(col("x"), lit(q)))
        .collect()(0).getDouble(0)
      val got = ExactQuantile.quantile(df, col("x"), q, bracketLimit = 2)
      assert(got === expect, s"n=$nTake q=$q")
    }
  }
}
