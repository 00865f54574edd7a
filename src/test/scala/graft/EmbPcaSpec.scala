package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbPca

class EmbPcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = EmbPca.fit(Tables(spark, sfDir, "embeddings"))

  test("layout-keyed moments are input-layout independent (the bake contract)") {
    // ModelOracle's baked components/muW/eigenvalues are valid only if
    // layoutKey fitting is a pure function of the data — pin the
    // eigenstructure bit-exactly across adversarial input layouts
    val emb = Tables(spark, sfDir, "embeddings")
    val a = EmbPca.fit(emb.repartition(7), layoutKey = Some("vec_id"))
    val b = EmbPca.fit(
      emb.repartition(3, col("label")).sortWithinPartitions("label"),
      layoutKey = Some("vec_id"))
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq &&
      a.mean.toSeq == b.mean.toSeq &&
      a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq,
      "the eigenstructure depends on the input layout — the baked " +
        "oracle would break under a different session geometry")
  }

  test("eigenvalues are non-negative and descending") {
    val ev = model.eigenvalues
    assert(ev.forall(_ >= -1e-9), ev.take(5).mkString(","))
    ev.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
  }

  test("components are orthonormal") {
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- 0 until 4; j <- i until 4) {
      val d = dot(model.components(i), model.components(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"<c$i,c$j> = $d")
    }
  }

  test("eigenvalue sum equals total variance (trace preservation)") {
    // trace(cov) = sum of per-dim variances = sum of eigenvalues
    val perDim = Tables(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg(var_pop(col("v").cast("double")).as("var"))
      .agg(sum("var")).collect()(0).getDouble(0)
    assert(math.abs(perDim - model.eigenvalues.sum) < 1e-6 * perDim)
  }

  test("projected variance along pc1 equals the top eigenvalue") {
    val proj = EmbPca.project(Tables(spark, sfDir, "embeddings"), model, 1)
    val v = proj.agg(var_pop(col("pc1"))).collect()(0).getDouble(0)
    assert(math.abs(v - model.eigenvalues(0)) < 1e-6 * model.eigenvalues(0),
      s"var(pc1)=$v vs ev1=${model.eigenvalues(0)}")
  }

  test("planted dominant direction is recovered") {
    // vectors = t * u + small noise; pc1 must align with u
    val dim = 8
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 0.5 else -0.5)
    val rows = (0 until 200).map { i =>
      val t = (i % 21 - 10).toDouble // spread along u
      val v = Array.tabulate(dim)(j =>
        (t * u(j) + 0.01 * (((i * 31 + j * 17) % 7) - 3)).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val m = EmbPca.fit(rows)
    val cos = m.components(0).zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(cos) > 0.999, s"|cos(pc1, u)| = ${math.abs(cos)}")
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1),
      "planted direction must dominate the spectrum")
  }

  test("mahalanobis via eigen route equals the explicit inverse") {
    // small 3-d dataset with a full-rank covariance; compare the
    // factored Σ_j pc_j²/λ_j score against (x-μ)ᵀΣ⁻¹(x-μ) computed by
    // direct Gaussian elimination on the driver
    val rows = (0 until 60).map { i =>
      val a = (i % 11).toDouble - 5
      val b = ((i * 7) % 13).toDouble - 6
      val c = 0.5 * a - 0.25 * b + ((i * 3) % 5).toDouble - 2
      (i.toLong, Seq(a.toFloat, b.toFloat, c.toFloat))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val m = EmbPca.fit(rows)
    val got = EmbPca.mahalanobis(rows, m)
      .select("vec_id", "m2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // rebuild Σ from the eigen decomposition and invert it explicitly
    val d = 3
    val cov = Array.tabulate(d, d)((i, j) =>
      m.components.indices.map(k =>
        m.eigenvalues(k) * m.components(k)(i) * m.components(k)(j)).sum)
    val aug = Array.tabulate(d)(i =>
      Array.tabulate(2 * d)(j =>
        if (j < d) cov(i)(j) else if (j - d == i) 1.0 else 0.0))
    for (p <- 0 until d) {
      val piv = (p until d).maxBy(r => math.abs(aug(r)(p)))
      val t = aug(p); aug(p) = aug(piv); aug(piv) = t
      val f = aug(p)(p)
      for (j <- 0 until 2 * d) aug(p)(j) /= f
      for (r <- 0 until d if r != p) {
        val g = aug(r)(p)
        for (j <- 0 until 2 * d) aug(r)(j) -= g * aug(p)(j)
      }
    }
    val inv = Array.tabulate(d, d)((i, j) => aug(i)(j + d))
    val data = rows.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    data.foreach { case (id, x) =>
      val c = Array.tabulate(d)(i => x(i) - m.mean(i))
      var want = 0.0
      for (i <- 0 until d; j <- 0 until d) want += c(i) * inv(i)(j) * c(j)
      assert(math.abs(got(id) - want) < 1e-6 * math.max(1.0, want),
        s"vec $id: eigen-route $got vs explicit $want")
    }
  }

  test("planted off-manifold outlier gets the top mahalanobis score") {
    val dim = 6
    val rows = (0 until 100).map { i =>
      val v =
        if (i == 57) Array.tabulate(dim)(j => if (j == 5) 40f else 0f)
        else Array.tabulate(dim)(j =>
          (((i * 31 + j * 17) % 9) - 4).toFloat * (if (j == 5) 0.01f else 1f))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val m = EmbPca.fit(rows)
    val top = EmbPca.mahalanobis(rows, m)
      .orderBy(col("m2").desc).select("vec_id").first().getLong(0)
    assert(top == 57L, s"expected planted outlier 57, got $top")
  }

  test("jacobi eigensolver matches a hand-checkable 2x2") {
    // [[2, 1], [1, 2]] has eigenvalues 3 and 1
    val (vals, vecs) = EmbPca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 &&
      math.abs(vals(1) - 1.0) < 1e-12, vals.mkString(","))
    // eigenvector for 3 is (1,1)/sqrt(2) up to sign
    assert(math.abs(math.abs(vecs(0)(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12)
  }
}
