package graft

import org.apache.spark.sql.functions._

/** Sampling operators that can't be oracle-checked (engine-specific
  * RNGs): seeded Bernoulli `sample` and stratified `sampleBy`. Pinned
  * by determinism (same seed twice = same rows) and statistical bounds
  * instead. The oracle-checkable systematic-sampling path is the
  * `sample_systematic` query (FuncsExtra).
  */
class SamplingSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sfDir, "orders")

  test("seeded Bernoulli sample is deterministic and near the fraction") {
    val a = orders.sample(withReplacement = false, 0.2, seed = 42)
    val b = orders.sample(withReplacement = false, 0.2, seed = 42)
    val ka = a.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val kb = b.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(ka === kb) // retried tasks must resample identically
    val n = orders.count().toDouble
    assert(math.abs(ka.size / n - 0.2) < 0.05)
  }

  test("stratified sampleBy honors per-stratum fractions") {
    val fractions = Map("1-URGENT" -> 0.5, "5-LOW" -> 0.1)
    val s = orders.stat.sampleBy("o_orderpriority", fractions, seed = 7)
    val bySeg = s.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted strata are dropped entirely
    assert(bySeg.keySet.subsetOf(fractions.keySet))
    fractions.foreach { case (k, f) =>
      val got = bySeg.getOrElse(k, 0L).toDouble / totals(k)
      assert(math.abs(got - f) < 0.15, s"stratum $k: got $got want ~$f")
    }
  }

  test("weighted sample is deterministic and biased by weight") {
    import spark.implicits._
    import graft.operators.WeightedSample
    // 1000 ids with weight 1, ids 9000-9009 with weight 200
    val df = ((0L until 1000L).map(i => (i, 1.0)) ++
      (9000L until 9010L).map(i => (i, 200.0)))
      .toDF("id", "w")

    val s1 = WeightedSample.sample(df, "id", "w", n = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = WeightedSample.sample(df, "id", "w", n = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1.size == 100)

    // every heavy item should make a 100-row sample: inclusion prob of
    // weight-200 items here is > 99.99%
    val heavyIn = (9000L until 9010L).count(s1.contains)
    assert(heavyIn == 10, s"only $heavyIn/10 heavy items sampled")

    // a different seed reshuffles the light tail
    val s3 = WeightedSample.sample(df, "id", "w", n = 100, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s3 != s1)

    // zero weight never samples ahead of positive weights
    val withZero = df.withColumn("w",
      when(col("id") < 990, 0.0).otherwise(col("w")))
    val s4 = WeightedSample.sample(withZero, "id", "w", n = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s4.forall(id => id >= 990))
  }
}
