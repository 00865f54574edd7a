package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed binary logistic regression over an embedding column —
  * the trainable quality classifier of a data-curation pipeline
  * (fastText-style filters: score documents against a small labeled
  * set, keep by probability). `text_quality_score` covers INFERENCE
  * with fixed weights; this is the TRAINING loop, built on the same
  * sufficient-statistics shape as [[LloydKMeans]]:
  *
  *  - full-batch gradient descent: each iteration is ONE corpus scan.
  *    The per-row error term (sigmoid(w.x + b) - y) is codegen'd scalar
  *    arithmetic (native DotProduct against the weight literal); the
  *    gradient is a (dim)-keyed hash aggregation of err * x_dim —
  *    d+2 doubles to the driver per iteration (d gradient dims, bias,
  *    loss), never data. Weights ride the plan as a literal — the
  *    broadcast-variable pattern for d in the thousands.
  *  - deterministic by construction: zero init, fixed iteration count
  *    and learning rate; no sampling, no row-order dependence beyond
  *    float reassociation (readouts round past it).
  *
  * L2 regularization keeps the separable case bounded; learning rate
  * is per-example (gradient averaged over n).
  */
object LogReg {

  /** Trained model: weights, bias, and per-iteration mean log-loss
    * (strictly decreasing on any consistent dataset — the convergence
    * diagnostic a training harness monitors).
    */
  final case class Model(w: Array[Double], b: Double, losses: Seq[Double])

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Margin + probability columns for a weight/bias literal. Weights
    * ride as a float literal (the native DotProduct contract, same as
    * LloydKMeans centroids); the update arithmetic stays double.
    */
  private def probCol(w: Array[Double], b: Double): Column =
    sigmoid(VectorOps.dot(col("embedding"),
      typedLit(w.map(_.toFloat).toSeq)) + lit(b))

  /** Packed gradient buffer: [g_0..g_{d-1}, g_bias, loss_sum, n] in
    * one map-side-combining typed aggregation (the EmbPca.MomentsAgg
    * pattern) — the whole per-iteration exchange is ONE (d+3)-double
    * array per partition, versus the earlier posexplode form shuffling
    * rows x dims exploded rows per iteration.
    */
  private class GradAgg(d: Int) extends
      org.apache.spark.sql.expressions.Aggregator[
        (Seq[Float], Double, Double), Array[Double], Array[Double]] {
    private val len = d + 3
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double],
        x: (Seq[Float], Double, Double)): Array[Double] = {
      val (e, err, ll) = x
      require(e.length == d, s"embedding dim ${e.length} != $d")
      var i = 0
      while (i < d) { b(i) += err * e(i).toDouble; i += 1 }
      b(d) += err
      b(d + 1) += ll
      b(d + 2) += 1
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < len) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Fit on (embedding, y) where `yCol` evaluates to 0.0/1.0. One scan
    * per iteration; the exchange is one packed (d+3)-double partial
    * per partition (map-side-combining typed aggregation).
    */
  def fit(dataRaw: DataFrame, yCol: Column, iters: Int = 20,
      lr: Double = 2.0, l2: Double = 1e-4): Model = {
    // materialize (embedding, y) once: every iteration rescans this
    // projection, so it pins in memory instead of re-reading the source
    val data = VectorOps.requireVectors(dataRaw, "LogReg.fit")
      .select(col("embedding"), yCol.cast("double").as("_y"))
      .localCheckpoint(true)
    val d = data.select(size(col("embedding"))).head().getInt(0)
    var w = new Array[Double](d)
    var b = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val spark = data.sparkSession
    import spark.implicits._
    val agg = new GradAgg(d)
    (0 until iters).foreach { _ =>
      val p = probCol(w, b)
      // clamp keeps the loss finite if a probability saturates
      val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
      val ll = -(col("_y") * log(pc) + (lit(1.0) - col("_y")) * log(lit(1.0) - pc))
      val buf = data
        .select(col("embedding"), (p - col("_y")).as("_err"), ll.as("_ll"))
        .as[(Seq[Float], Double, Double)]
        .select(agg.toColumn)
        .head()
      val n = buf(d + 2)
      losses += buf(d + 1) / n
      val g = buf
      w = Array.tabulate(d)(i => w(i) - lr * (g(i) / n + l2 * w(i)))
      b -= lr * g(d) / n
    }
    Model(w, b, losses.toSeq)
  }

  /** Probability column per row under a trained model (pure codegen —
    * inference is scan-speed, exactly the `text_quality_score` path).
    */
  def score(dataRaw: DataFrame, m: Model): DataFrame = {
    val data = VectorOps.requireVectors(dataRaw, "LogReg.score")
    data.withColumn("prob", probCol(m.w, m.b))
  }
}
