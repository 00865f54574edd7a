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

  test("funnel-maintained BM25 index == batch index over the survivors") {
    // round-12: the text index rides the corpus funnel's foreachBatch
    // (processBatch(bm25Dir=...)) with the same batch=<id> overwrite
    // idempotency as the dedup indexes — one ingest program maintains
    // ALL the cross-batch state. Pins: (1) the streamed index answers
    // exactly like a batch build over the emitted survivors, (2) an
    // at-least-once REPLAY of a batch changes nothing, (3) mid-stream
    // compaction (with the in-flight batch held out, as auto-
    // compaction runs it) stays probe-invisible.
    import graft.pipeline.CorpusPipeline
    import graft.streaming.StreamingFunnel
    val cfg = CorpusPipeline.Config()
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source").cache()
    val idx = Files.createTempDirectory("fbm-idx").toString
    val out = Files.createTempDirectory("fbm-out").toString
    val bm = s"${Files.createTempDirectory("fbm-bm25").toString}/idx"

    val ids = docs.select(min("doc_id"), max("doc_id")).collect()(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val step = (hi - lo) / 3 + 1
    val chunks = (0 until 3).map(i => docs.where(
      col("doc_id") >= lo + i * step && col("doc_id") < lo + (i + 1) * step))
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingFunnel.processBatch(c, i.toLong, cfg, idx, out,
        bm25Dir = Some(bm))
    }
    val terms = Seq("hash", "vector", "filter", "merge", "scan")
    def q(path: String) = Bm25Index.query(spark, path, terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // manifest-aware: after a fold, dead runs linger on disk for
    // in-flight readers — a raw glob would double-count them
    def nDocs(path: String) = Bm25Index.table(spark, path, "stats")
      .agg(sum("n_docs")).collect()(0).getDouble(0)

    val ref = Files.createTempDirectory("fbm-ref").toString
    // materialize the survivor set BEFORE the replays below overwrite
    // batch=2's part files (a lazy frame would hold a stale listing)
    val nSurv = spark.read.parquet(out).count().toDouble
    Bm25Index.write(spark.read.parquet(out).select("doc_id", "text")
      .localCheckpoint(true), "doc_id", "text", ref)
    assert(q(bm) == q(ref),
      s"funnel index diverged from the batch build:\n${q(bm)}\n${q(ref)}")
    assert(nDocs(bm) == nSurv,
      "funnel index must count exactly the emitted survivors")

    // at-least-once replay of the last batch: nothing changes
    StreamingFunnel.processBatch(chunks(2), 2L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(q(bm) == q(ref), "a replayed batch changed the index")
    assert(nDocs(bm) == nSurv,
      "a replayed batch double-counted stats partials")

    // auto-compaction shape: fold with the in-flight batch held out,
    // then a replay of that batch — still invisible
    StreamingFunnel.compact(spark, idx, excludeBatch = Some(2L),
      bm25Dir = Some(bm))
    assert(q(bm) == q(ref), "compaction changed probe results")
    StreamingFunnel.processBatch(chunks(2), 2L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(q(bm) == q(ref),
      "replay after held-out compaction changed the index")
    assert(nDocs(bm) == nSurv)
  }
}
