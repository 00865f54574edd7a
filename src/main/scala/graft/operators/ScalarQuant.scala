package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Int8 scalar quantization for embedding columns — the
  * high-fidelity, 4x-compression complement to PQ's 32x (the same
  * ladder FAISS exposes as SQ8 vs PQ): each vector stores per-vector
  * (min, scale) and one byte per dimension, x_i ≈ min + scale*code_i.
  *
  * Ranking reads the byte codes (4x less IO than floats), scoring is
  * dot(q, x̂) = min*Σq_i + scale*Σ q_i*code_i — exact against the
  * RECONSTRUCTION, so the only error is the <= scale/2 rounding per
  * dimension; with an exact top-R rerank the end-to-end top-k is
  * near-lossless. All deterministic: quantization is a pure per-row
  * function, no training pass at all (the operational advantage over
  * PQ/IVF — nothing to retrain as the corpus drifts).
  */
object ScalarQuant {

  /** (vec_id, q: one byte/dim, vmin, vscale, approx_nrm): approx_nrm
    * is the exact norm of the reconstruction, computed in the same
    * pass.
    */
  def encode(corpus: DataFrame): DataFrame = {
    val enc = udf { v: Array[Float] =>
      var mn = Double.MaxValue
      var mx = Double.MinValue
      var i = 0
      while (i < v.length) {
        val x = v(i).toDouble
        if (x < mn) mn = x
        if (x > mx) mx = x
        i += 1
      }
      val scale = if (mx > mn) (mx - mn) / 255.0 else 1.0
      val q = new Array[Byte](v.length)
      var nrm2 = 0.0
      i = 0
      while (i < v.length) {
        val c = math.round((v(i).toDouble - mn) / scale).toInt
        q(i) = c.toByte
        val rec = mn + scale * c
        nrm2 += rec * rec
        i += 1
      }
      (q, mn, scale, math.sqrt(nrm2))
    }
    corpus.select(col("vec_id"), enc(col("embedding")).as("e"))
      .select(col("vec_id"), col("e._1").as("q"), col("e._2").as("vmin"),
        col("e._3").as("vscale"), col("e._4").as("approx_nrm"))
  }

  /** Top-k by quantized cosine + exact rerank of the top-R ids (same
    * harness shape as PqAnn.pqTopK; queries are the small side and
    * broadcast as precomputed (values, Σq, norm) triples).
    */
  def sqTopK(corpus0: DataFrame, queries0: DataFrame, k: Int,
      rerankFactor: Int = 2): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = queries.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val q = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), q, q.sum, math.sqrt(q.map(x => x * x).sum))
      }
    val bcQ = spark.sparkContext.broadcast(qArr)

    val scored = encode(corpus)
      .select(col("vec_id"), col("q"), col("vmin"), col("vscale"),
        col("approx_nrm"))
      .as[(Long, Array[Byte], Double, Double, Double)]
      .flatMap { case (vid, q, vmin, vscale, anrm) =>
        bcQ.value.iterator.filter(_._1 != vid).map { case (qid, qv, qsum, qnrm) =>
          var wsum = 0.0
          var i = 0
          while (i < q.length) {
            wsum += qv(i) * (q(i) & 0xFF)
            i += 1
          }
          val dot = vmin * qsum + vscale * wsum
          (qid, vid, dot / (qnrm * math.max(anrm, 1e-12)))
        }
      }
      .toDF("qid", "vec_id", "sim_sq")

    // candidate cut via the native bounded-heap TopKPerKey: the scored
    // set is corpus x batch with qid (the bounded batch) as the only
    // key, so a row_number window would sort the whole corpus per qid
    // on a handful of reducers — the heaps keep rerankFactor*k rows per
    // (partition, qid) below the exchange instead.
    val cand = org.apache.spark.sql.graftx.TopKPerKey.topK(
        scored.select("qid", "vec_id", "sim_sq"), keys = Seq("qid"),
        order = Seq(("sim_sq", true), ("vec_id", false)),
        k = rerankFactor * k)
      .select("qid", "vec_id")

    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val exact = corpus.join(broadcast(cand), Seq("vec_id"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * VectorOps.norm(col("embedding")))).as("sim"))
    // exact rerank is bounded (rerankFactor*k rows per qid) but runs
    // the same native top-k as the rest of the ANN family for one
    // plan shape to pin
    org.apache.spark.sql.graftx.TopKPerKey.topK(
        exact, keys = Seq("qid"),
        order = Seq(("sim", true), ("vec_id", false)), k = k)
      .orderBy("qid", "rank")
  }
}
