package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.LloydKMeans

/** Streaming mini-batch k-means: centroids fold forward one arriving
  * micro-batch at a time (Sculley-style running-mean updates) — the
  * clustering analogue of the BM25/IVF streaming maintenance. The
  * state is k x d driver floats; each batch costs one distributed
  * assignment pass.
  */
class StreamingKMeansSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")
    .select("vec_id", "embedding").cache()

  test("whole-corpus fold equals one Lloyd round") {
    val s0 = LloydKMeans.initMiniBatch(emb, k = 4)
    val s1 = LloydKMeans.miniBatchUpdate(s0, emb)
    val (lloyd1, _, _) = LloydKMeans.fit(emb, k = 4, iters = 1)
    s1.centroids.zip(lloyd1).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-4, s"$x vs $y")
      }
    }
  }

  test("foreachBatch mini-batch stream converges like batch training") {
    val srcDir = Files.createTempDirectory("kmeans-src").toString
    (0 until 4).foreach { r =>
      emb.where(pmod(col("vec_id"), lit(4)) === r)
        .write.mode("append").parquet(srcDir)
    }
    var state = LloydKMeans.initMiniBatch(emb, k = 4)
    val q = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          if (!batch.isEmpty)
            state = LloydKMeans.miniBatchUpdate(state, batch)
      }
      .option("checkpointLocation",
        Files.createTempDirectory("kmeans-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(state.counts.sum == emb.count(),
      "every streamed vector must fold into exactly one centroid")
    val streamed = LloydKMeans.inertia(emb, state.centroids)
    val (batchCs, _, _) = LloydKMeans.fit(emb, k = 4, iters = 2)
    val batch = LloydKMeans.inertia(emb, batchCs)
    val init = LloydKMeans.inertia(emb,
      LloydKMeans.initMiniBatch(emb, k = 4).centroids)
    assert(streamed < init,
      f"mini-batch folding must improve on the init ($streamed%.2f vs $init%.2f)")
    assert(streamed < batch * 1.5,
      f"streamed inertia $streamed%.2f vs batch $batch%.2f — diverged?")
  }
}
