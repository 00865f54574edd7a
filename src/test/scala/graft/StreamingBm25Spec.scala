package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Bm25Index

/** Streaming retrieval-index maintenance: new document batches arrive
  * on a stream and fold into the persisted BM25 index via foreachBatch
  * → appendToIndex. Because the index's df/stats are MERGEABLE
  * partials, each micro-batch only appends its own files — so the
  * streamed index must answer probes identically to the same appends
  * done in batch, regardless of how the stream chopped the data.
  */
class StreamingBm25Spec extends SparkSpec {

  test("foreachBatch appendToIndex: streamed index == batch index") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    val head = docs.where(pmod(col("doc_id"), lit(4)) =!= 0)
    val tail = docs.where(pmod(col("doc_id"), lit(4)) === 0)

    val streamedIdx = Files.createTempDirectory("bm25-stream").toString
    val batchIdx = Files.createTempDirectory("bm25-batch").toString
    Bm25Index.write(head, "doc_id", "text", streamedIdx)
    Bm25Index.write(head, "doc_id", "text", batchIdx)
    Bm25Index.appendToIndex(tail, "doc_id", "text", batchIdx)

    val srcDir = Files.createTempDirectory("bm25-src").toString
    tail.where(pmod(col("doc_id"), lit(8)) === 0)
      .write.mode("append").parquet(srcDir)
    tail.where(pmod(col("doc_id"), lit(8)) === 4)
      .write.mode("append").parquet(srcDir)
    val q = spark.readStream
      .schema(tail.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          if (!batch.isEmpty)
            Bm25Index.appendToIndex(batch, "doc_id", "text", streamedIdx)
      }
      .option("checkpointLocation",
        Files.createTempDirectory("bm25-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val terms = Seq("hash", "vector", "filter", "merge", "scan")
    val s = Bm25Index.query(spark, streamedIdx, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val b = Bm25Index.query(spark, batchIdx, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(s.toSeq == b.toSeq, s"streamed=${s.toSeq}\nbatch=${b.toSeq}")

    // maintenance mid-lifecycle: compaction between ingest windows is
    // probe-invisible, and ingest continues on the compacted index
    // exactly as if the appends had never been merged (the months-of-
    // uptime OPTIMIZE cadence: append ... compact ... append ...)
    Bm25Index.compactIndex(spark, streamedIdx)
    val sc = Bm25Index.query(spark, streamedIdx, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(sc.toSeq == b.toSeq, "compaction changed probe results")
    val extra = docs.where(pmod(col("doc_id"), lit(4)) === 2)
      .withColumn("doc_id", col("doc_id") + 20000000L)
    Bm25Index.appendToIndex(extra, "doc_id", "text", streamedIdx)
    Bm25Index.appendToIndex(extra, "doc_id", "text", batchIdx)
    val s2 = Bm25Index.query(spark, streamedIdx, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val b2 = Bm25Index.query(spark, batchIdx, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(s2.toSeq == b2.toSeq,
      "post-compaction ingest must track the never-compacted twin")
  }
}
