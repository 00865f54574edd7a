package graft

import org.apache.spark.sql.functions._

import graft.operators.LloydKMeans

class LloydKMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("inertia is non-increasing across Lloyd rounds") {
    val (_, _, inertia) = LloydKMeans.fit(emb, k = 8, iters = 5)
    assert(inertia.length == 5)
    inertia.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-6, s"inertia rose: $inertia")
    }
  }

  test("every vector is assigned exactly once; k clusters at most") {
    val (_, assigned, _) = LloydKMeans.fit(emb, k = 8, iters = 3)
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("cluster").distinct().count()
    assert(clusters <= 8 && clusters >= 2)
  }

  test("well-separated planted clusters are recovered exactly") {
    // three tight blobs far apart; any sane k-means separates them
    val blobs = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0f)
      base(c) = 100f
      (i.toLong, base.map(x => x + (i / 3) * 0.01f).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val (_, assigned, _) = LloydKMeans.fit(blobs, k = 3, iters = 4)
    val purity = assigned
      .select((col("vec_id") % 3).as("truth"), col("cluster"))
      .groupBy("truth", "cluster").count()
    // each truth group lands in exactly one cluster and vice versa
    assert(purity.count() == 3, purity.collect().mkString(","))
  }

  test("deterministic run-to-run (content-addressed init, tie-broken argmin)") {
    val a = LloydKMeans.clusterStats(emb, k = 8, iters = 3).collect().toSeq
    val b = LloydKMeans.clusterStats(emb, k = 8, iters = 3).collect().toSeq
    assert(a == b)
  }

  test("trained centroids are input-layout independent (the bake contract)") {
    // the KmeansOracle bake is valid only if the FINAL centroids are a
    // pure function of the data — fit()'s internal hash-repartition +
    // within-partition sort must erase whatever layout the input
    // arrives in (session width, file splits, prior shuffles). Pin it
    // bit-exactly across adversarial input layouts.
    import org.apache.spark.sql.functions.col
    val a = LloydKMeans.fit(emb.repartition(7), k = 8, iters = 2)._1
    val b = LloydKMeans.fit(
      emb.repartition(3, col("label")).sortWithinPartitions("label"),
      k = 8, iters = 2)._1
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "centroids depend on the input layout — the baked oracle would " +
        "break under a different session geometry")
  }
}
