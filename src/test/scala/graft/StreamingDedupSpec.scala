package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** Streaming ingest dedup against the persisted LSH index — the
  * lifecycle a continuously-fed corpus actually runs: each arriving
  * micro-batch (1) probes the index for near-dups of everything
  * already ingested, (2) appends its OWN survivors into the index so
  * later batches dedup against it too. Batch chopping must be
  * invisible: the union of per-batch matches has to equal the batch
  * probe of the same data, and docs arriving AFTER their near-dup
  * must be caught even when the two land in different micro-batches.
  */
class StreamingDedupSpec extends SparkSpec {

  test("foreachBatch probe+append: stream chopping is result-invisible") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    val corpus = docs.where(pmod(col("doc_id"), lit(4)) =!= 0)
    val arriving = docs.where(pmod(col("doc_id"), lit(4)) === 0)

    // streamed path: index starts from the standing corpus
    val sIdx = Files.createTempDirectory("lsh-stream").toString
    Dedup.writeLshIndex(corpus, "doc_id", "text", sIdx)
    // batch reference: same standing corpus, the whole arrival probed
    // at once
    val bIdx = Files.createTempDirectory("lsh-batch").toString
    Dedup.writeLshIndex(corpus, "doc_id", "text", bIdx)
    val expected = Dedup.dedupAgainstIndex(
        arriving, "doc_id", "text", bIdx, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val srcDir = Files.createTempDirectory("lsh-src").toString
    arriving.where(pmod(col("doc_id"), lit(8)) === 0)
      .write.mode("append").parquet(srcDir)
    arriving.where(pmod(col("doc_id"), lit(8)) === 4)
      .write.mode("append").parquet(srcDir)

    val matches =
      scala.collection.mutable.Set.empty[(Long, Long)]
    val q = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          if (!batch.isEmpty) {
            matches.synchronized {
              matches ++= Dedup.dedupAgainstIndex(
                  batch, "doc_id", "text", sIdx, threshold = 0.5)
                .collect().map(r => (r.getLong(0), r.getLong(1)))
            }
            // survivors-only append keeps the index duplicate-lean;
            // here every batch doc appends (matching the batch
            // reference, which probed all arrivals against the
            // corpus-only index)
            Dedup.appendToLshIndex(batch, "doc_id", "text", sIdx)
          }
      }
      .option("checkpointLocation",
        Files.createTempDirectory("lsh-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // streamed matches ⊇ batch matches: every corpus near-dup found,
    // plus possibly cross-batch arrival pairs the batch reference (by
    // construction) cannot see
    val corpusSide = matches.toSet.filter(p => p._2 % 4 != 0)
    assert(corpusSide == expected,
      s"missing: ${expected -- corpusSide}; extra: ${corpusSide -- expected}")
    // and the appended index must now ALSO catch arrival-vs-arrival
    // pairs in later probes: re-probing one arrived doc's text hits it
    val probe = arriving.limit(1)
      .select((col("doc_id") + lit(500000000L)).as("doc_id"), col("text"))
    val self = Dedup.dedupAgainstIndex(
        probe, "doc_id", "text", sIdx, threshold = 0.5)
      .collect().map(r => r.getLong(1)).toSet
    assert(self.exists(_ % 4 == 0),
      "the streamed appends must be probe-visible")
  }
}
