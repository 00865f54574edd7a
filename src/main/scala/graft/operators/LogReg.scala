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
  *  - full-batch gradient descent: each iteration is ONE corpus scan
  *    over a cached primitive-array RDD with the weights captured in
  *    the task closure (the MLlib shape; see `fit` for why the
  *    DataFrame-literal form loses here). The exchange per iteration
  *    is d+3 doubles per partition to the driver — gradient dims,
  *    bias, loss, count — never data.
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

  /** Fit on (embedding, y) where `yCol` evaluates to 0.0/1.0. One scan
    * per iteration; the exchange is one packed (d+3)-double partial
    * per partition.
    *
    * The iteration body is a cached primitive-array RDD with the
    * weights captured in the task closure (the MLlib gradient-descent
    * shape). A DataFrame form would splice the weights in as literals,
    * so every round re-analyzes the plan and RECOMPILES whole-stage
    * codegen — a per-iteration fixed cost that dominates when rounds
    * are many and scans are cheap. Here the corpus is decoded out of
    * Tungsten exactly once; each round is pure closure arithmetic
    * (identical to the codegen'd form: weights cast to float, dot
    * accumulated left-to-right in double — the DotProduct contract)
    * and partials merge on the driver in ascending partition order,
    * which is MORE deterministic than a shuffled single-reducer merge.
    * This is the documented RDD exception: an iterative optimizer's
    * inner loop, d+3 doubles per partition per round to the driver,
    * never data.
    */
  def fit(dataRaw: DataFrame, yCol: Column, iters: Int = 20,
      lr: Double = 2.0, l2: Double = 1e-4,
      layoutKey: Option[String] = None): Model = {
    // layoutKey pins the training layout (the LloydKMeans.fit pattern,
    // round 10): per-partition gradient partials merge in ascending
    // partition index, so with a hash-repartition on the key + sorted
    // partitions the final weights are a pure function of the data —
    // which is what lets the trained model bake into a DuckDB oracle
    // (ModelBakedData) instead of a golden pin.
    val pinned = layoutKey.fold(dataRaw)(k =>
      dataRaw.repartition(LloydKMeans.TrainPartitions, col(k))
        .sortWithinPartitions(k))
    val data = VectorOps.requireVectors(pinned, "LogReg.fit")
      .select(col("embedding"), yCol.cast("double").as("_y"))
    val spark = data.sparkSession
    import spark.implicits._
    val rdd = data.as[(Seq[Float], Double)].rdd
      .map { case (e, y) => (e.toArray, y) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = rdd.first()._1.length
      var w = new Array[Double](d)
      var b = 0.0
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      (0 until iters).foreach { _ =>
        val wf = w.map(_.toFloat)
        val bb = b
        val partials = rdd.mapPartitionsWithIndex { (ix, it) =>
          val buf = new Array[Double](d + 3)
          while (it.hasNext) {
            val (e, y) = it.next()
            require(e.length == d, s"embedding dim ${e.length} != $d")
            var dot = 0.0
            var i = 0
            while (i < d) { dot += e(i).toDouble * wf(i).toDouble; i += 1 }
            val p = 1.0 / (1.0 + math.exp(-(dot + bb)))
            val err = p - y
            // clamp keeps the loss finite if a probability saturates
            val pc = math.min(math.max(p, 1e-12), 1.0 - 1e-12)
            val ll = -(y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc))
            i = 0
            while (i < d) { buf(i) += err * e(i).toDouble; i += 1 }
            buf(d) += err
            buf(d + 1) += ll
            buf(d + 2) += 1
          }
          Iterator((ix, buf))
        }.collect().sortBy(_._1).map(_._2)
        val g = new Array[Double](d + 3)
        partials.foreach { p =>
          var i = 0
          while (i < d + 3) { g(i) += p(i); i += 1 }
        }
        val n = g(d + 2)
        losses += g(d + 1) / n
        w = Array.tabulate(d)(i => w(i) - lr * (g(i) / n + l2 * w(i)))
        b -= lr * g(d) / n
      }
      Model(w, b, losses.toSeq)
    } finally rdd.unpersist(blocking = false)
  }

  /** Probability column per row under a trained model (pure codegen —
    * inference is scan-speed, exactly the `text_quality_score` path).
    */
  def score(dataRaw: DataFrame, m: Model): DataFrame = {
    val data = VectorOps.requireVectors(dataRaw, "LogReg.score")
    data.withColumn("prob", probCol(m.w, m.b))
  }
}
