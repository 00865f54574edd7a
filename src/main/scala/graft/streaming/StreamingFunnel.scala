package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.pipeline.CorpusPipeline

/** The corpus funnel as ONE incremental streaming program — the shape
  * a 100 TB ingest actually runs (the batch composition is
  * [[CorpusPipeline.prepare]]; rehearsed at 100x in Scale100Spec):
  *
  *   ingest micro-batch
  *     -> language filter            (row-local)
  *     -> quality filter             (row-local)
  *     -> exact dedup                (within batch + against the
  *                                    persisted hash index)
  *     -> near dedup                 (within batch + probe of the
  *                                    persisted MinHash-LSH index)
  *     -> survivors appended; batch docs appended to both indexes
  *
  * Every batch does BATCH-SIZED work: the cross-batch state lives in
  * two persisted, append-only indexes (md5 hash table, LSH bands +
  * shingles — [[Dedup.writeLshIndex]]'s lifecycle), probed by
  * equi-join, never rescanned. Per-batch latency therefore tracks the
  * batch, not total history — StreamingFunnelSpec pins both that and
  * result parity: streamed survivors equal the batch funnel run over
  * the same corpus (batch chopping is result-invisible).
  *
  * Near-dedup parity note: the batch path keeps the min-id member of
  * each near-dup COMPONENT. The streamed twin reproduces that as long
  * as batches arrive in id order (the backfill/ingest norm): ALL
  * exact-surviving docs append to the LSH index (survivors-only
  * appends would blind later batches to dropped members' neighbors),
  * so a doc is dropped iff it near-matches any earlier-ingested or
  * smaller-id-in-batch doc — the greedy reading of min-id-per-
  * component. StreamingFunnelSpec pins the equality on real data.
  */
object StreamingFunnel {

  final case class BatchStats(batchId: Long, nInput: Long, nLang: Long,
    nQuality: Long, nExact: Long, nNear: Long, ms: Long)

  private def exists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Process ONE micro-batch (also the unit the spec drives directly):
    * returns the per-stage stats. Exposed separately from [[attach]] so
    * a foreachBatch caller can compose extra sinks around it.
    */
  def processBatch(batch: DataFrame, batchId: Long, cfg: CorpusPipeline.Config,
      indexDir: String, survivorsDir: String): BatchStats = {
    val t0 = System.nanoTime()
    val spark = batch.sparkSession
    val nInput = batch.count()
    val lang = CorpusPipeline.languageFiltered(batch, cfg)
    val nLang = lang.count()
    val qual = CorpusPipeline.qualityFiltered(lang, cfg)
      .localCheckpoint(true) // one materialization feeds all dedup stages
    val nQuality = qual.count()

    // exact dedup: min-id per digest within the batch, then anti-join
    // the persisted hash index (the O3 exists-check pattern — batch
    // keys probe the index, never the reverse)
    val hashDir = s"$indexDir/hashes"
    val inBatch = CorpusPipeline.exactDeduped(qual)
      .withColumn("_h", md5(col("text")))
    val exact = (if (exists(spark, hashDir))
        inBatch.join(spark.read.parquet(hashDir), Seq("_h"), "left_anti")
      else inBatch)
      .localCheckpoint(true)
    exact.select("_h").write.mode(SaveMode.Append).parquet(hashDir)
    val nExact = exact.count()
    val docs = exact.drop("_h")

    // near dedup: drop batch docs matching the LSH index (anything
    // ingested earlier), then min-id-per-component within the batch
    val lshDir = s"$indexDir/lsh"
    val indexed = exists(spark, s"$lshDir/bands")
    val idxMatched =
      if (indexed)
        Dedup.dedupAgainstIndex(docs, "doc_id", "text", lshDir,
            cfg.dedupThreshold)
          .select(col("batch_id").as("doc_id")).distinct()
      else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    val afterIdx = docs.join(idxMatched, Seq("doc_id"), "left_anti")
    val survivors = Dedup.survivorsFromPairs(afterIdx, "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", cfg.dedupThreshold))
      .localCheckpoint(true)
    // ALL exact-surviving docs enter the index (see scaladoc), AFTER
    // the probe so a doc can't match itself
    Dedup.appendToLshIndex(docs, "doc_id", "text", lshDir)
    val nNear = survivors.count()
    survivors.write.mode(SaveMode.Append).parquet(survivorsDir)
    BatchStats(batchId, nInput, nLang, nQuality, nExact, nNear,
      (System.nanoTime() - t0) / 1000000)
  }

  /** Wire the funnel onto a streaming frame as a foreachBatch sink.
    * AvailableNow by default (drain the backlog, then stop — the
    * batch-parity harness shape); pass a processing-time trigger for a
    * continuously-fed deployment.
    */
  def attach(stream: DataFrame, cfg: CorpusPipeline.Config,
      indexDir: String, survivorsDir: String, checkpointDir: String,
      onBatch: BatchStats => Unit = _ => (),
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          if (!batch.isEmpty)
            onBatch(processBatch(batch.toDF(), id, cfg, indexDir,
              survivorsDir))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
