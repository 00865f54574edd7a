package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbPca

class EmbPcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = EmbPca.fit(Tables(spark, sfDir, "embeddings"))

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
