package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Fully distributed Lloyd k-means over an embedding column — the
  * corpus-scale complement of IvfAnn's driver-sample trainer: here the
  * E step assigns EVERY corpus vector each round (one scan, codegen'd
  * arithmetic, no UDF) and the M step is one (cluster, dim) hash
  * aggregation whose output is k x d rows — bounded driver state at
  * any corpus size. Per iteration: one scan + one shuffle of k*d
  * partial sums. Centroids ride the plan as literals (k*d floats —
  * broadcast-variable territory, far under any practical limit for
  * clustering-sized k).
  *
  * Everything is deterministic: init picks the k vectors with the
  * smallest (md5(vec_id), vec_id) — content-addressed, engine- and
  * layout-independent; the argmin breaks distance ties on the lower
  * cluster index via lexicographic struct comparison.
  */
object LloydKMeans {

  /** Fixed training-layout width (see [[fit]]): part of the trained
    * artifact's definition, NOT a tuning knob — changing it changes
    * the float-sum merge order and hence the baked-oracle centroids.
    * At 100 TB the per-partition partial is still k*(d+1)+1 doubles,
    * so width only bounds per-task input, not driver merge state.
    */
  val TrainPartitions = 32

  /** dist^2 to each literal centroid; argmin via array_min over
    * (dist, idx) structs — struct ordering compares dist first, index
    * second, so ties deterministically pick the lower index. Stays in
    * codegen: DotProduct is a native expression and the rest is scalar
    * arithmetic.
    */
  private def assignCol(cs: Array[Array[Float]]): Column = {
    val xx = VectorOps.dot(col("embedding"), col("embedding"))
    val entries = cs.zipWithIndex.map { case (c, j) =>
      val cl = typedLit(c.toSeq)
      val cc = c.map(x => x.toDouble * x.toDouble).sum
      struct(
        (xx - lit(2.0) * VectorOps.dot(col("embedding"), cl) + lit(cc))
          .as("d"),
        lit(j).as("i"))
    }
    array_min(array(entries.toIndexedSeq: _*))
  }

  /** Deterministic, content-addressed initial centroids. */
  private def init(corpus: DataFrame, k: Int,
      idCol: String = "vec_id"): Array[Array[Float]] = {
    val rows = corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select("embedding").collect()
    require(rows.length == k, s"corpus has fewer than k=$k vectors")
    rows.map(_.getSeq[Float](0).toArray)
  }

  /** Runs `iters` Lloyd rounds. Returns (final centroids, assigned
    * frame with `cluster` and `dist2` columns, per-round inertia).
    * Empty clusters keep their previous centroid (standard Lloyd
    * degeneracy handling).
    *
    * The E/M loop runs over a cached primitive-array RDD with the
    * centroids captured in the task closure (the [[LogReg.fit]]
    * rationale: centroid LITERALS change every round, so the
    * DataFrame form re-analyzes and recompiles the k-way argmin
    * codegen per iteration — pure fixed cost). Arithmetic is
    * bit-compatible with [[assignCol]]: same xx - 2*dot + cc expansion,
    * dots accumulated left-to-right in double, ties keep the lower
    * cluster index. E and M fuse into ONE pass; the per-iteration
    * exchange is k*(d+1)+1 doubles per partition to the driver
    * (sums, counts, sse), merged in ascending partition order —
    * never data. The FINAL assignment stays on the declarative
    * DataFrame path so downstream readouts keep codegen + pushdown.
    */
  def fit(corpusRaw: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id")
      : (Array[Array[Float]], DataFrame, Seq[Double]) = {
    val corpus = VectorOps.requireVectors(corpusRaw, "LloydKMeans.fit")
    require(corpus.columns.contains(idCol),
      s"LloydKMeans.fit: id column '$idCol' not found in " +
        s"[${corpus.columns.mkString(", ")}] — the deterministic " +
        "training layout repartitions+sorts on it (pass idCol= for a " +
        "differently-keyed corpus); it is part of the baked-artifact " +
        "contract, same values => same layout => same centroids")
    var cs = init(corpus, k, idCol)
    val d = cs(0).length
    val inertia = scala.collection.mutable.ArrayBuffer.empty[Double]
    val spark = corpus.sparkSession
    import spark.implicits._
    // Deterministic training layout (round 10): per-partition float
    // partials merge in ascending partition index, so the sums — and
    // through Lloyd's feedback, the final centroids — depend on which
    // rows share a partition and in what order. Hash-repartitioning on
    // vec_id to a FIXED width and sorting within partitions makes the
    // layout a pure function of the data, independent of session core
    // count or file-split geometry — which is what lets the final
    // centroids be baked into the DuckDB oracle (KmeansBakedData) and
    // replayed by any engine. One extra shuffle+sort, paid once before
    // the cached multi-round E/M loop.
    val rdd = corpus
      .repartition(TrainPartitions, col(idCol))
      .sortWithinPartitions(idCol)
      .select(col("embedding")).as[Seq[Float]].rdd
      .map(_.toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until iters).foreach { _ =>
        val cls = cs // stable closure capture
        val cc = cls.map(c => c.map(x => x.toDouble * x.toDouble).sum)
        // packed partial: [sums k*d | counts k | sse]
        val partials = rdd.mapPartitionsWithIndex { (ix, it) =>
          val buf = new Array[Double](k * d + k + 1)
          while (it.hasNext) {
            val e = it.next()
            var xx = 0.0
            var i = 0
            while (i < d) { xx += e(i).toDouble * e(i).toDouble; i += 1 }
            var best = 0
            var bestD = Double.PositiveInfinity
            var j = 0
            while (j < k) {
              var dot = 0.0
              i = 0
              while (i < d) { dot += e(i).toDouble * cls(j)(i).toDouble; i += 1 }
              val dist = xx - 2.0 * dot + cc(j)
              if (dist < bestD) { bestD = dist; best = j }
              j += 1
            }
            i = 0
            while (i < d) { buf(best * d + i) += e(i).toDouble; i += 1 }
            buf(k * d + best) += 1
            buf(k * d + k) += bestD
          }
          Iterator((ix, buf))
        }.collect().sortBy(_._1).map(_._2)
        val agg = new Array[Double](k * d + k + 1)
        partials.foreach { p =>
          var i = 0
          while (i < agg.length) { agg(i) += p(i); i += 1 }
        }
        inertia += agg(k * d + k)
        cs = Array.tabulate(k) { c =>
          val n = agg(k * d + c)
          if (n == 0.0) cs(c)
          else Array.tabulate(d)(i => (agg(c * d + i) / n).toFloat)
        }
      }
    } finally rdd.unpersist(blocking = false)
    val finalAssigned = corpus.withColumn("a", assignCol(cs))
      .select(col(idCol), col("embedding"),
        col("a.i").as("cluster"), col("a.d").as("dist2"))
    (cs, finalAssigned, inertia.toSeq)
  }

  /** Per-cluster readout: size and SSE — the clustering health profile
    * a mixture/curation pipeline monitors.
    */
  def clusterStats(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    fit(corpus, k, iters)._2
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        // away-from-zero on the scaled double = DuckDB's round(DOUBLE)
        // arithmetic, so the oracle's rounding matches by construction
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(sum("dist2"), 4).as("sse"))
      .orderBy("cluster")

  // ---- streaming (mini-batch) path ---------------------------------

  /** Running mini-batch state: centroids plus per-centroid counts of
    * every vector ever folded in — k x d doubles of driver state, the
    * clustering analogue of the BM25/IVF mergeable-partials lifecycle.
    */
  final case class MiniBatchState(centroids: Array[Array[Float]],
      counts: Array[Long])

  def initMiniBatch(firstBatch: DataFrame, k: Int): MiniBatchState =
    MiniBatchState(
      init(VectorOps.requireVectors(firstBatch, "LloydKMeans.initMiniBatch"),
        k),
      new Array[Long](k))

  /** One mini-batch fold (public method: Sculley 2010, "Web-Scale
    * K-Means Clustering"): assign the batch to the current centroids
    * (one distributed pass, codegen argmin), then move each centroid
    * toward its batch mean with the per-centroid running-mean rate
    * m_c/(n_c + m_c) — so folding the whole corpus as ONE batch equals
    * a single Lloyd round, and every batch is batch-sized work.
    */
  def miniBatchUpdate(state: MiniBatchState, batchRaw: DataFrame)
      : MiniBatchState = {
    val batch = VectorOps.requireVectors(batchRaw, "LloydKMeans.miniBatchUpdate")
    val k = state.centroids.length
    val d = state.centroids(0).length
    val stats = batch.withColumn("a", assignCol(state.centroids))
      .select(col("a.i").as("cluster"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("m"))
      .collect()
    val sums = Array.fill(k, d)(0.0)
    val m = new Array[Long](k)
    stats.foreach { r =>
      sums(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      m(r.getInt(0)) = r.getLong(3)
    }
    val centroids = Array.tabulate(k) { c =>
      if (m(c) == 0L) state.centroids(c)
      else {
        val n = state.counts(c) + m(c)
        val rate = m(c).toDouble / n
        Array.tabulate(d) { i =>
          val batchMean = sums(c)(i) / m(c)
          (state.centroids(c)(i) * (1 - rate) + batchMean * rate).toFloat
        }
      }
    }
    MiniBatchState(centroids,
      Array.tabulate(k)(c => state.counts(c) + m(c)))
  }

  /** Inertia of a corpus against fixed centroids (one scan). */
  def inertia(corpusRaw: DataFrame, centroids: Array[Array[Float]]): Double = {
    val corpus = VectorOps.requireVectors(corpusRaw, "LloydKMeans.inertia")
    corpus.withColumn("a", assignCol(centroids))
      .agg(sum(col("a.d"))).collect()(0).getDouble(0)
  }
}
