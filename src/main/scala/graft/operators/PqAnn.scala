package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product-quantization ANN (Jégou et al., "Product quantization for
  * nearest neighbor search", TPAMI 2011) — the third scale path next
  * to IVF and hyperplane LSH.
  *
  * What it buys at 100 TB: the scored representation of a vector is
  * `m` codebook ids (here 8 bytes) instead of `dim` floats (256 bytes
  * for dim=64) — a 32x smaller scan for the ranking pass, and the
  * per-pair score is `m` table lookups + adds instead of `dim`
  * multiplies (asymmetric distance computation). Exact rerank then
  * touches only the top-R candidate ids per query.
  *
  * Deterministic end to end, same discipline as IvfAnn: bounded
  * driver-side sample (modulus derived from corpus count), fixed Lloyd
  * iterations per subspace, ties broken by id.
  */
object PqAnn {

  /** Per-subspace codebooks trained on a BOUNDED driver sample:
    * result(m)(c) is the c-th codeword (dsub doubles) of subspace m.
    */
  def trainCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleMod: Int = 0, iters: Int = 5): Array[Array[Array[Double]]] = {
    val mod =
      if (sampleMod > 0) sampleMod
      else {
        val n = corpus.count()
        math.min(Int.MaxValue.toLong, math.max(1L, n / (ksub * 100L))).toInt
      }
    // hash the id before the modulus (same fix as IvfAnn.trainCentroids):
    // `vec_id % mod` confounds the sample with id-assignment structure;
    // ordered collect keeps training layout-independent
    val sample = corpus
      .where(pmod(
        org.apache.spark.sql.graftx.SplitMix64.column(col("vec_id")),
        lit(mod.toLong)) === 0)
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { sub =>
      val slice = sample.map(v => v.slice(sub * dsub, (sub + 1) * dsub))
      kmeans(slice, math.min(ksub, slice.length), iters)
    }
  }

  private def kmeans(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = points.take(k).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      points.foreach { v =>
        val c = nearestSub(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearestSub(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      val cv = cs(c)
      while (i < v.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** vec -> m codebook ids, one byte each (BinaryType — the compact
    * scan is the whole point).
    */
  private def encodeUdf(books: Array[Array[Array[Double]]]) =
    udf { v: Array[Float] =>
      val m = books.length
      val dsub = books(0)(0).length
      val code = new Array[Byte](m)
      var sub = 0
      while (sub < m) {
        val slice = new Array[Double](dsub)
        var i = 0
        while (i < dsub) { slice(i) = v(sub * dsub + i).toDouble; i += 1 }
        code(sub) = nearestSub(slice, books(sub)).toByte
        sub += 1
      }
      code
    }

  /** Corpus codes: (vec_id, code, approx_nrm). approx_nrm is the norm
    * of the RECONSTRUCTED vector — a pure function of the code, so it
    * rides along from the encode pass instead of a second lookup.
    */
  def encode(corpus: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val sqnorms: Array[Array[Double]] =
      books.map(_.map(cw => cw.map(x => x * x).sum))
    val nrmUdf = udf { code: Array[Byte] =>
      var s = 0.0
      var sub = 0
      while (sub < code.length) {
        s += sqnorms(sub)(code(sub) & 0xFF)
        sub += 1
      }
      math.sqrt(s)
    }
    corpus.select(col("vec_id"),
        encodeUdf(books)(col("embedding")).as("code"))
      .withColumn("approx_nrm", nrmUdf(col("code")))
  }

  /** PQ-ADC top-k with exact rerank.
    *
    * Ranking pass: queries are collected (they are the small side by
    * contract, same as Similarity.cosineTopK) and turned into per-query
    * lookup tables LUT[sub][c] = dot(q_sub, codeword); the corpus side
    * streams CODES only. Top `rerankFactor * k` candidates per query
    * then join back to the raw embeddings for exact cosine — so the
    * full-width vectors are read for ~R ids per query, not the corpus.
    */
  def pqTopK(corpus0: DataFrame, queries0: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, rerankFactor: Int = 12, sampleMod: Int = 0): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = trainCodebooks(corpus, m, ksub, sampleMod)
    val codes = encode(corpus, books)

    val qArr = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dsub = books(0)(0).length
    // flattened LUTs: (qid, dotLut[m*ksubEff], qnrm)
    val luts = qArr.map { case (qid, q) =>
      val lut = Array.ofDim[Double](books.map(_.length).sum)
      var off = 0
      for (sub <- books.indices; c <- books(sub).indices) {
        var d = 0.0
        var i = 0
        while (i < dsub) { d += q(sub * dsub + i) * books(sub)(c)(i); i += 1 }
        lut(off) = d
        off += 1
      }
      val qnrm = math.sqrt(q.map(x => x * x).sum)
      (qid, lut, qnrm)
    }
    val ksubEff = books(0).length
    val bcLuts = spark.sparkContext.broadcast(luts)

    val scored = codes
      .select(col("vec_id"), col("code"), col("approx_nrm"))
      .as[(Long, Array[Byte], Double)]
      .flatMap { case (vid, code, anrm) =>
        bcLuts.value.iterator.filter(_._1 != vid).map { case (qid, lut, qnrm) =>
          var s = 0.0
          var sub = 0
          while (sub < code.length) {
            s += lut(sub * ksubEff + (code(sub) & 0xFF))
            sub += 1
          }
          (qid, vid, s / (qnrm * math.max(anrm, 1e-12)))
        }
      }
      .toDF("qid", "vec_id", "sim_adc")

    val cand = org.apache.spark.sql.graftx.TopKPerKey
      .topK(scored, keys = Seq("qid"),
        order = Seq(("sim_adc", true), ("vec_id", false)),
        k = rerankFactor * k, rankName = "r")
      .select("qid", "vec_id")

    // exact rerank: only candidate ids re-read full-width vectors
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val exact = corpus.join(broadcast(cand), Seq("vec_id"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * VectorOps.norm(col("embedding")))).as("sim"))
    org.apache.spark.sql.graftx.TopKPerKey
      .topK(exact, keys = Seq("qid"),
        order = Seq(("sim", true), ("vec_id", false)), k = k)
      .orderBy("qid", "rank")
  }
}
