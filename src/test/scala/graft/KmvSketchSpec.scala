package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvSketch

/** KMV sketch properties the oracle can't see: estimator accuracy at a
  * cardinality well above k (the registered queries run where n < k or
  * barely above, so the estimate path needs its own pin), merge
  * idempotency, and overlap-estimate sanity against exact Jaccard.
  */
class KmvSketchSpec extends SparkSpec {

  test("estimate is within 3/sqrt(k) of a 10k-distinct truth") {
    import spark.implicits._
    val k = 256
    val df = (1 to 10000).map(i => ("g", s"value_$i")).toDF("g", "v")
    val sk = KmvSketch.sketch(df, "g", col("v"), k)
      .select(col("n_exact"),
        KmvSketch.estimate(col("mins"), k).as("est"))
      .collect()(0)
    val (exact, est) = (sk.getLong(0), sk.getDouble(1))
    assert(exact == 10000L)
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 3.0 / math.sqrt(k),
      s"est=$est exact=$exact relErr=$relErr")
  }

  test("sketch below k holds the full distinct set: estimate is exact") {
    import spark.implicits._
    val df = (1 to 40).flatMap(i => Seq(("g", s"v$i"), ("g", s"v$i")))
      .toDF("g", "v")
    val sk = KmvSketch.sketch(df, "g", col("v"), 64)
      .select(col("n_exact"),
        KmvSketch.estimate(col("mins"), 64).as("est"),
        size(col("mins")).as("m"))
      .collect()(0)
    assert(sk.getLong(0) == 40L)
    assert(sk.getInt(2) == 40)
    assert(sk.getDouble(1) == 40.0)
  }

  test("kmin buffer is duplicate-safe and merge-order-independent") {
    val agg = new KmvSketch.KMinAgg(4)
    val a = Seq(5L, 1L, 9L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(1L, 3L, 7L, 11L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b) == agg.merge(b, a))
    assert(agg.merge(a, b) == Seq(1L, 3L, 5L, 7L))
    assert(agg.reduce(agg.merge(a, b), 1L) == Seq(1L, 3L, 5L, 7L))
  }

  test("overlap estimate tracks exact token jaccard on the corpus") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("source"), explode(
        graft.text.TextOps.tokens(col("text"))).as("w"))
    val k = 64
    val est = KmvSketch.overlap(
        KmvSketch.sketch(docs, "source", col("w"), k), "source", k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    val toks = docs.distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
      .toMap
    for (((a, b), je) <- est) {
      val exact = toks(a).intersect(toks(b)).size.toDouble /
        toks(a).union(toks(b)).size
      // k=64 bottom-k jaccard: binomial std ~ sqrt(J(1-J)/k) <= 0.063
      assert(math.abs(je - exact) < 0.25,
        s"pair ($a,$b): sketch=$je exact=$exact")
    }
  }
}
