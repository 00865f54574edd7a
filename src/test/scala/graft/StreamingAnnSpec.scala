package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{IvfAnn, Similarity}

/** Streaming index maintenance: new embedding batches arrive on a
  * stream and are folded into a persisted IVF index via foreachBatch →
  * appendToIndex (the FAISS-style add path). Pins that (a) no vector is
  * lost or duplicated across micro-batches, (b) the streamed index
  * answers queries identically to the same appends done in batch, and
  * (c) recall against brute force stays at the batch-built level.
  */
class StreamingAnnSpec extends SparkSpec {

  test("foreachBatch appendToIndex: streamed tail == batch tail, recall holds") {
    val emb = Tables(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val split = (n * 7 / 10).toInt
    val head = emb.where(col("vec_id") < split)
    val tail = emb.where(col("vec_id") >= split)

    val streamedIdx = Files.createTempDirectory("graft-ann-stream").toString
    val batchIdx = Files.createTempDirectory("graft-ann-batch").toString
    IvfAnn.writeIndex(head, streamedIdx, nlist = 8)
    IvfAnn.writeIndex(head, batchIdx, nlist = 8)

    // batch reference: one append call
    IvfAnn.appendToIndex(tail, batchIdx)

    // streamed: the tail arrives as parquet files on a watched dir
    val srcDir = Files.createTempDirectory("graft-ann-src").toString
    tail.where(pmod(col("vec_id"), lit(2)) === 0)
      .write.mode("append").parquet(srcDir)
    tail.where(pmod(col("vec_id"), lit(2)) === 1)
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) => IvfAnn.appendToIndex(batch, streamedIdx)
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ann-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // (a) completeness: every vector exactly once
    val streamedIds = spark.read.parquet(s"$streamedIdx/assigned")
      .groupBy("vec_id").count()
    assert(streamedIds.where(col("count") =!= 1).count() === 0)
    assert(streamedIds.count() === n)

    // (b) identical answers to the batch-appended twin
    val queries = emb.where(
      pmod(col("vec_id"), lit(50)) === 0 && col("vec_id") < 400)
    def answers(dir: String) =
      IvfAnn.queryIndex(spark, dir, queries, k = 5, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(answers(streamedIdx) === answers(batchIdx))

    // (c) recall@5 against brute force on the full corpus
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = answers(streamedIdx)
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 after streamed appends: $recall")
  }
}
