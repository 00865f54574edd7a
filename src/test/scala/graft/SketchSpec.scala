package graft

import org.apache.spark.sql.functions._

/** HLL sketch aggregates: estimates have no cross-engine oracle, so pin
  * the error bound (lgConfigK=14 -> ~0.8% standard error; assert 5%)
  * and the mergeability contract (union of partial sketches estimates
  * the global distinct, the whole point of sketching at 100 TB).
  */
class SketchSpec extends SparkSpec {

  test("per-group and unioned estimates are within 5% of exact") {
    val est = graft.queries.FuncsExtra.hllSketch(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables(spark, sfDir, "orders")
    val exactAll = orders.select("o_custkey").distinct().count()
    val exactPer = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def close(a: Long, b: Long) =
      math.abs(a - b).toDouble / math.max(b, 1) < 0.05
    assert(close(est("ALL"), exactAll), s"ALL: ${est("ALL")} vs $exactAll")
    exactPer.foreach { case (g, n) =>
      assert(close(est(g), n), s"$g: ${est(g)} vs $n")
    }
  }

  test("approx percentile lands within the declared accuracy of exact") {
    val orders = Tables(spark, sfDir, "orders")
    val Array(approx, exact) = orders
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)),
        percentile(col("o_totalprice"), lit(0.5)))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    // accuracy=1000 -> rank error <= n/1000; translate to a loose
    // value bound via the empirical spread
    assert(math.abs(approx - exact) / math.max(exact, 1.0) < 0.02,
      s"approx $approx vs exact $exact")
  }

  test("sketches merge associatively: partial unions match one-shot") {
    val orders = Tables(spark, sfDir, "orders")
    val oneShot = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(14))))
      .collect()(0).getLong(0)
    val merged = orders
      .groupBy(pmod(col("o_orderkey"), lit(7))) // arbitrary partitioning
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(oneShot === merged)
  }

  test("theta set-op estimates stay within 2% at 100k cardinality") {
    // two overlapping 100k-id segments: A = [0, 100k), B = [50k, 150k)
    val a = spark.range(0, 100000).toDF("id")
      .agg(theta_sketch_agg(col("id")).as("s"))
    val b = spark.range(50000, 150000).toDF("id")
      .agg(theta_sketch_agg(col("id")).as("s"))
    val est = a.crossJoin(b.withColumnRenamed("s", "t"))
      .select(
        theta_sketch_estimate(col("s")).as("na"),
        theta_sketch_estimate(theta_union(col("s"), col("t"))).as("nu"),
        theta_sketch_estimate(theta_intersection(col("s"), col("t"))).as("ni"),
        theta_sketch_estimate(theta_difference(col("s"), col("t"))).as("nd"))
      .head()
    def within(est: Long, truth: Long, tol: Double): Unit =
      assert(math.abs(est - truth) <= tol * truth, s"est=$est truth=$truth")
    within(est.getLong(0), 100000L, 0.02)
    within(est.getLong(1), 150000L, 0.02)
    within(est.getLong(2), 50000L, 0.05) // intersection error compounds
    within(est.getLong(3), 50000L, 0.05)
  }
}
