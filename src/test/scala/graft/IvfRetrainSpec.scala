package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfAnn, Similarity}

/** The closing arc of the persisted-IVF lifecycle (round-5 verdict
  * task 7): build -> append drifted batches -> watch probe recall
  * decay against the exact baseline -> retrain via writeIndex ->
  * recall recovers. This is the operational loop a production ANN
  * deployment runs off its recall monitor (`sim_ann_recall`): append
  * is cheap and correct for additive batches, but centroids trained on
  * yesterday's distribution partition tomorrow's vectors badly — the
  * probed nprobe lists stop containing the true neighbors, which is
  * recall decay, which is the retrain trigger. Measured numbers in
  * docs/SCALING.md ("IVF retrain trigger — round 6").
  */
class IvfRetrainSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16

  /** Deterministic noisy vector around a base direction. */
  private def vec(base: Array[Double], noise: Double,
      seed: Long): Array[Float] = {
    val r = new scala.util.Random(seed)
    base.map(x => (x + noise * r.nextGaussian()).toFloat)
  }

  /** Initial corpus: eight tight one-hot clusters (axes 0..7) — a
    * distribution the 16-list index fits naturally, so the fresh
    * index starts at recall ~1 (a 2-cluster base would force k-means
    * to shard each cluster 8 ways and cap fresh recall at ~0.7,
    * muddying the drift signal).
    */
  private def initialCorpus: DataFrame =
    (0 until 200).map { i =>
      val base = Array.fill(dim)(0.0)
      base(i % 8) = 1.0
      (i.toLong, vec(base, 0.05, 1000L + i))
    }.toDF("vec_id", "embedding")

  /** Drifted batch: eight NEW one-hot clusters (axes 8..15) the old
    * centroids never saw, with enough within-cluster spread (0.2) that
    * STALE assignment — decided by noise projections onto directions
    * carrying no neighborhood information — scatters true neighbors
    * across lists the query does not probe. A FRESH retrain gives each
    * drift cluster its own cell, making assignment noise-immune again
    * (tuned offline with a k-means simulation mirroring
    * trainCentroids: fresh 1.0, drift ~0.3, retrained ~1.0).
    */
  private def driftedBatch(offset: Long): DataFrame =
    (0 until 200).map { i =>
      val base = Array.fill(dim)(0.0)
      base(8 + i % 8) = 1.0
      (offset + i, vec(base, 0.2, 5000L + offset + i))
    }.toDF("vec_id", "embedding")

  /** Mean recall@k of the probed index against exact brute force for
    * the given query set.
    */
  private def recallAt(k: Int, dir: String, corpus: DataFrame,
      queries: DataFrame, nprobe: Int): Double = {
    val exact = Similarity.cosineTopK(corpus, queries, k)
      .select("qid", "vec_id")
    val approx = IvfAnn.queryIndex(spark, dir, queries, k, nprobe)
      .select("qid", "vec_id")
    val nHits = exact.join(approx, Seq("qid", "vec_id")).count().toDouble
    nHits / exact.count()
  }

  test("append-induced recall decay triggers retrain, retrain recovers") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-retrain").toString
    val base = initialCorpus.localCheckpoint(true)
    IvfAnn.writeIndex(base, dir, nlist = 16, sampleMod = 1)

    // phase 1: on-distribution queries against the fresh index
    val qBase = base.where(col("vec_id") % 10 === 3)
    val r0 = recallAt(5, dir, base, qBase, nprobe = 2)

    // phase 2: the distribution drifts; batches are APPENDED (cheap,
    // no rebuild) and queries now come from the drifted region
    val drift1 = driftedBatch(10000L).localCheckpoint(true)
    val drift2 = driftedBatch(20000L).localCheckpoint(true)
    IvfAnn.appendToIndex(drift1, dir)
    IvfAnn.appendToIndex(drift2, dir)
    val full = base.unionByName(drift1).unionByName(drift2)
      .localCheckpoint(true)
    val qDrift = drift2.where(col("vec_id") % 10 === 3)
    val rDrift = recallAt(5, dir, full, qDrift, nprobe = 2)

    // the monitor's trigger condition: drifted recall well below the
    // fresh-index baseline
    info(f"recall@5: fresh $r0%.3f, after drift $rDrift%.3f")
    assert(r0 >= 0.9, f"fresh index must start healthy, got $r0%.3f")
    assert(rDrift < 0.8,
      f"drift did not decay recall ($rDrift%.3f) — fixture too easy")

    // phase 3: retrain = writeIndex over the grown corpus (the FAISS
    // 'periodic retrain' answer); same queries recover
    IvfAnn.writeIndex(full, dir, nlist = 16, sampleMod = 1)
    val rAfter = recallAt(5, dir, full, qDrift, nprobe = 2)
    info(f"recall@5 after retrain: $rAfter%.3f")
    assert(rAfter >= 0.9,
      f"retrain must restore recall, got $rAfter%.3f")
    assert(rAfter > rDrift + 0.1, "retrain must be a material recovery")
  }
}
