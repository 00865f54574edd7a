package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed PCA over an embedding column — the dimensionality
  * profile a curation pipeline reads before choosing ANN parameters,
  * whitening, or a projection budget.
  *
  * Scale shape: ALL distributed work is ONE typed-Aggregator pass
  * collecting the sufficient statistics (n, per-dim sums, upper-
  * triangular Gram) — a d(d+3)/2+1-double buffer (~17 KB at d=64)
  * that combines map-side, so the shuffle carries one packed partial
  * per partition regardless of corpus size. The driver then forms the
  * d x d covariance and runs cyclic Jacobi rotations (classic
  * symmetric eigensolver, Golub & Van Loan §8.5) — O(d^3) on a
  * 64 x 64 matrix, microseconds. Projection is codegen'd dot products
  * against literal component vectors. Nothing corpus-sized ever
  * reaches the driver and the corpus is scanned once for the fit and
  * once per projection pass.
  */
object EmbPca {

  final case class Model(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  /** (n, sums, upper-tri gram) in one packed buffer. */
  private class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], x: Seq[Float]): Array[Double] = {
      require(x.length == d, s"embedding dim ${x.length} != $d")
      b(0) += 1
      var i = 0
      var t = 1 + d
      while (i < d) {
        val xi = x(i).toDouble
        b(1 + i) += xi
        var j = i
        while (j < d) { b(t) += xi * x(j).toDouble; j += 1; t += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate
    * away the largest-magnitude off-diagonals sweep by sweep until
    * convergence. Deterministic (fixed sweep order), returns
    * (eigenvalues, eigenvectors as rows) sorted by eigenvalue desc.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-11) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += 2 * apq * apq
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** One aggregation pass -> covariance -> driver eigensolve.
    *
    * `layoutKey` (round 10) makes the moments pass layout-
    * deterministic: the stock typed-Aggregator path merges partials in
    * shuffle-arrival order, which is fine for the statistics but makes
    * the last-ulp float sums — and through Jacobi's rotations, the
    * eigenvectors — a function of scheduling. With a key, partials are
    * computed per hash-pinned sorted partition and merged in ascending
    * partition index (the LloydKMeans.fit pattern), so the model is a
    * pure function of the data and can bake into the DuckDB oracle.
    */
  def fit(corpusRaw: DataFrame, layoutKey: Option[String] = None): Model = {
    val corpus = VectorOps.requireVectors(corpusRaw, "EmbPca.fit")
    val d = corpus.select(size(col("embedding"))).first().getInt(0)
    implicit val enc: Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
    val packed = layoutKey match {
      case None =>
        corpus.select(col("embedding")).as[Seq[Float]]
          .select(new MomentsAgg(d).toColumn)
          .collect()(0)
      case Some(k) =>
        val agg = new MomentsAgg(d)
        val partials = corpus
          .repartition(LloydKMeans.TrainPartitions, col(k))
          .sortWithinPartitions(k)
          .select(col("embedding")).as[Seq[Float]].rdd
          .mapPartitionsWithIndex { (ix, it) =>
            Iterator((ix, it.foldLeft(agg.zero)(agg.reduce)))
          }
          .collect().sortBy(_._1).map(_._2)
        partials.foldLeft(agg.zero)(agg.merge)
    }
    val n = packed(0).toLong
    require(n > 1, "PCA needs at least 2 vectors")
    val mean = Array.tabulate(d)(i => packed(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = packed(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    Model(n, mean, vals, vecs)
  }

  /** Adds `pc1..pcK` columns: centered projection onto the top-k
    * components as codegen'd dot products against literal vectors
    * (x·w - μ·w, the μ·w scalar folded at plan time).
    */
  def project(corpusRaw: DataFrame, model: Model, k: Int): DataFrame = {
    val corpus = VectorOps.requireVectors(corpusRaw, "EmbPca.project")
    model.components.take(k).zipWithIndex.foldLeft(corpus) {
      case (df, (w, j)) =>
        val wf = typedLit(w.map(_.toFloat).toSeq)
        val muW = model.mean.zip(w).map { case (m, x) => m * x }.sum
        df.withColumn(s"pc${j + 1}",
          VectorOps.dot(col("embedding"), wf) - lit(muW))
    }
  }

  /** Adds a `m2` squared-Mahalanobis-distance column: (x-μ)ᵀΣ⁻¹(x-μ)
    * factored through the eigendecomposition Σ = VΛVᵀ as
    * Σ_j ((x-μ)·v_j)² / λ_j — the multivariate embedding-space outlier
    * score (encoding glitches, off-manifold junk, adversarial inserts
    * that no per-dimension z-score catches). Pure codegen: d dot
    * products against literal component vectors, compiled once —
    * scan-speed inference, ZERO exchange, exactly the [[project]]
    * shape. Eigenvalues are floored at `eps` x trace so rank-deficient
    * directions don't explode the score (the standard ridge).
    */
  def mahalanobis(corpusRaw: DataFrame, model: Model,
      eps: Double = 1e-9): DataFrame = {
    val corpus = VectorOps.requireVectors(corpusRaw, "EmbPca.mahalanobis")
    val floor = eps * model.eigenvalues.sum
    val terms = model.components.zip(model.eigenvalues).map { case (w, ev) =>
      val wf = typedLit(w.map(_.toFloat).toSeq)
      val muW = model.mean.zip(w).map { case (m, x) => m * x }.sum
      val p = VectorOps.dot(col("embedding"), wf) - lit(muW)
      p * p / lit(math.max(ev, floor))
    }
    corpus.withColumn("m2", terms.reduce(_ + _))
  }

  /** Registered readout: eigenvalue spectrum of the top components
    * with explained-variance ratios.
    */
  def varianceProfile(spark: SparkSession, dir: String,
      topK: Int = 8): DataFrame = {
    import spark.implicits._
    val model = fit(graft.Tables(spark, dir, "embeddings"),
      layoutKey = Some("vec_id"))
    val total = model.eigenvalues.sum
    var cum = 0.0
    model.eigenvalues.take(topK).zipWithIndex.map { case (ev, i) =>
      cum += ev
      (i + 1L, math.rint(ev * 1e6) / 1e6,
        math.rint(ev / total * 1e6) / 1e6,
        math.rint(cum / total * 1e6) / 1e6)
    }.toSeq.toDF("component", "eigenvalue", "explained", "cum_explained")
  }
}
