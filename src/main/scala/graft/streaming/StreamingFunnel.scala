package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, RollingBloom}
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
  * shingles — [[Dedup.writeLshIndex]]'s lifecycle), and the LSH index
  * is hash-prefix-partitioned so each probe PARTITION-PRUNES to the
  * batch's touched prefixes instead of rescanning history. Per-batch
  * latency therefore tracks the batch, not total ingested volume —
  * StreamingFunnelSpec pins both that and result parity.
  *
  * Idempotency (foreachBatch is at-least-once): every write this
  * funnel makes is an OVERWRITE of a `batch=<id>` subtree — hash
  * index, LSH index ([[Dedup.appendToLshIndex]]'s `subdir`),
  * survivors, ingest watermarks — and every index probe EXCLUDES the
  * current batch id. A replayed micro-batch therefore recomputes from
  * exactly the pre-batch state and overwrites its own outputs: a crash
  * at any point between writes changes nothing about the final state.
  *
  * Near-dedup parity: index-match pairs join the in-batch pair graph
  * as edges (not a pre-filter), so a batch doc bridged to an earlier
  * corpus doc through ANOTHER batch doc inherits the global component
  * — transitive chains resolve exactly as the batch funnel does.
  * Components ANCHORED to an index doc drop all their batch members
  * (the indexed survivor was already emitted and cannot be retracted);
  * unanchored components elect the min-id member. Survivor-set
  * equality with [[CorpusPipeline.prepare]] then holds whenever
  * batches arrive in id order (the backfill/ingest norm): the anchor
  * IS the component minimum under id-ordered arrival, so anchoring and
  * min-id election coincide. Out-of-order arrival still yields a valid
  * greedy dedup — first-INGESTED wins and no near-dup pair survives,
  * in any order (spec-pinned on scrambled shards) — but may keep a
  * different member than the batch run would; the funnel DETECTS it —
  * each batch's id range is persisted and [[BatchStats.nOutOfOrder]]
  * counts arrivals below the prior watermark, so a deployment can
  * alert instead of silently diverging.
  */
object StreamingFunnel {

  final case class BatchStats(batchId: Long, nInput: Long, nLang: Long,
    nQuality: Long, nExact: Long, nNear: Long, ms: Long,
    nOutOfOrder: Long = 0L)

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
    import spark.implicits._
    // batch-scoped storage hygiene: this funnel (and the index probe
    // inside it) pins several batch-sized localCheckpoints as
    // materialization barriers; without explicit cleanup every
    // micro-batch LEAKS those blocks (disk-backed blocks are never
    // evicted), so months of ingest accumulate a full copy of history
    // in the block store. Snapshot the persisted-RDD ids at entry and
    // drop exactly the ones this batch created — user-held caches
    // outside the batch are untouched. Everything the checkpoints feed
    // is fully materialized before the method returns (stats scalars +
    // parquet writes), so nothing lazy escapes the cleanup.
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    try processBatchInner(batch, batchId, cfg, indexDir, survivorsDir, t0)
    finally {
      val after = spark.sparkContext.getPersistentRDDs
      (after.keySet -- rddsBefore).foreach(id =>
        after.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  private def processBatchInner(batch: DataFrame, batchId: Long,
      cfg: CorpusPipeline.Config, indexDir: String, survivorsDir: String,
      t0: Long): BatchStats = {
    val spark = batch.sparkSession
    import spark.implicits._

    // ingest-order watermark: batches before this one (replay-safe:
    // own batch id excluded) — arrivals below it are out of order
    val ingestDir = s"$indexDir/ingest"
    val prevMax: Option[Long] =
      if (!exists(spark, ingestDir)) None
      else spark.read.parquet(ingestDir)
        .where(col("batch") =!= lit(batchId))
        .agg(max("max_id")).collect().headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val ord = batch.agg(
      count(lit(1)), min("doc_id"), max("doc_id"),
      coalesce(sum((col("doc_id") < lit(prevMax.getOrElse(Long.MinValue)))
        .cast("long")), lit(0L))).collect()(0)
    val nInput = ord.getLong(0)
    val nOutOfOrder = if (prevMax.isEmpty) 0L else ord.getLong(3)

    val lang = CorpusPipeline.languageFiltered(batch, cfg)
    val nLang = lang.count()
    val qual = CorpusPipeline.qualityFiltered(lang, cfg)
      .localCheckpoint(true) // one materialization feeds all dedup stages
    val nQuality = qual.count()

    // exact dedup: min-id per digest within the batch, then anti-join
    // the persisted hash index (the O3 exists-check pattern — batch
    // keys probe the index, never the reverse). Same sub-linear probe
    // shape as the LSH index: the rolling hash bloom first drops every
    // batch digest provably absent from history (those rows survive
    // the anti-join against ANY subset of the index, so pruning can't
    // lose them), and only the bloom survivors' hp prefixes are read —
    // without this every micro-batch re-scanned the full digest
    // history.
    val hashDir = s"$indexDir/hashes"
    val inBatch = CorpusPipeline.exactDeduped(qual)
      .withColumn("_h", md5(col("text"))).persist()
    val exact = (if (exists(spark, hashDir)) {
        val idx0 = spark.read.parquet(hashDir)
          .where(col("batch") =!= lit(batchId))
        val idx = (RollingBloom.read(spark, s"$indexDir/hashbloom",
            Some(batchId)), readHashPrefixes(spark, hashDir)) match {
          case (Some(bf), Some(p))
              if idx0.schema.fieldNames.contains("hp") =>
            val b = spark.sparkContext.broadcast(bf)
            val mc = udf((h: String) => b.value.mightContainString(h))
            val touched = inBatch.where(mc(col("_h")))
              .select(pmod(hash(col("_h")), lit(p)).as("hp"))
              .distinct().collect().map(_.getInt(0)).toSeq
            idx0.where(col("hp").isin(touched: _*))
          case _ => idx0
        }
        inBatch.join(idx.select("_h"), Seq("_h"), "left_anti")
      } else inBatch)
      .localCheckpoint(true)
    writeHashBatch(exact.select("_h"), indexDir, batchId)
    val nExact = exact.count()
    val docs = exact.drop("_h")

    // near dedup: index-match pairs UNION the in-batch pair graph, one
    // component pass elects keepers — a batch doc whose component
    // reaches any earlier corpus doc (directly or through other batch
    // docs) inherits the global component, so transitive chains
    // resolve exactly as the batch funnel does. Pairs come from ALL
    // exact survivors (not just eventual keepers) so chains through
    // dropped docs still bridge.
    //
    // Components ANCHORED to an index doc drop ALL their batch
    // members, never min-id-elect: the indexed doc was already emitted
    // as a survivor and cannot be retracted, so electing a batch doc
    // with a smaller id (possible only under out-of-order arrival)
    // would emit BOTH sides of a near-dup pair. Under id-ordered
    // ingest the anchor is the component minimum anyway, so this is
    // exactly the batch funnel's min-id election; out of order it is
    // the first-ingested-wins greedy the header contract promises.
    val lshDir = s"$indexDir/lsh"
    val inBatchPairs = Dedup
      .minhashLshPairs(docs, "doc_id", "text", cfg.dedupThreshold)
      .select("ida", "idb")
    val idxPairs =
      if (exists(spark, s"$lshDir/bands"))
        Dedup.dedupAgainstIndex(docs, "doc_id", "text", lshDir,
            cfg.dedupThreshold, excludeBatch = Some(batchId))
          .select(col("batch_id").as("ida"), col("corpus_id").as("idb"))
          .localCheckpoint(true) // feeds both the edge set and the anchors
      else spark.emptyDataset[(Long, Long)].toDF("ida", "idb")
    val survivors = Dedup
      .survivorsAgainstIndex(docs, "doc_id", inBatchPairs, idxPairs)
      .localCheckpoint(true)
    // ALL exact-surviving docs enter the index (survivors-only appends
    // would blind later batches to dropped members' neighbors), into
    // this batch's own overwrite-on-replay subtree
    Dedup.appendToLshIndex(docs, "doc_id", "text", lshDir,
      subdir = Some(batchId))
    val nNear = survivors.count()
    survivors.write.mode(SaveMode.Overwrite)
      .parquet(s"$survivorsDir/batch=$batchId")
    Seq((ord.getLong(1), ord.getLong(2))).toDF("min_id", "max_id")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$ingestDir/batch=$batchId")
    BatchStats(batchId, nInput, nLang, nQuality, nExact, nNear,
      (System.nanoTime() - t0) / 1000000, nOutOfOrder)
  }

  /** Expected distinct documents for the hash index's rolling bloom —
    * `spark.graft.hash.bloomCapacity`, default 16M (~14 MB at 3% fpp).
    * Size to the deployment's corpus; over-full only degrades pruning.
    */
  def hashBloomCapacity(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.hash.bloomCapacity")
      .map(_.toLong).getOrElse(16000000L)

  private def hashMetaPath(hashDir: String) =
    new org.apache.hadoop.fs.Path(s"$hashDir/_graft_hash_meta")

  /** The hp-prefix modulus the hash index was built with (recorded at
    * first write, like the LSH `_graft_lsh_meta` — probes never read
    * the live conf, so a conf change cannot mis-prune). None = legacy
    * unpartitioned layout: probes fall back to the full read.
    */
  def readHashPrefixes(spark: org.apache.spark.sql.SparkSession,
      hashDir: String): Option[Int] = {
    val p = hashMetaPath(hashDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.collectFirst {
        case l if l.startsWith("prefixes=") =>
          l.stripPrefix("prefixes=").trim.toInt
      }
    }
  }

  /** Write one batch's digests into the hash index: hp-prefix
    * partitioned under its own overwrite-on-replay `batch=<id>`
    * subtree, plus the rolling bloom snapshot. The unit the replay
    * spec also drives directly to simulate a half-written crash.
    */
  def writeHashBatch(hashes: DataFrame, indexDir: String,
      batchId: Long): Unit = {
    val spark = hashes.sparkSession
    val hashDir = s"$indexDir/hashes"
    val prefixes = readHashPrefixes(spark, hashDir).getOrElse {
      val n = Dedup.lshIndexPrefixes(spark)
      val p = hashMetaPath(hashDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(s"prefixes=$n\n".getBytes("UTF-8"))
      finally out.close()
      n
    }
    val path = s"$hashDir/batch=$batchId"
    hashes.select(col("_h"))
      .withColumn("hp", pmod(hash(col("_h")), lit(prefixes)))
      .repartition(col("hp"))
      .write.mode(SaveMode.Overwrite).partitionBy("hp").parquet(path)
    RollingBloom.roll(spark, s"$indexDir/hashbloom",
      spark.read.parquet(path), "_h", Some(batchId),
      hashBloomCapacity(spark), 0.03)
  }

  /** Compact the funnel's cross-batch state (maintenance, run from
    * the single ingest writer between batches — the OPTIMIZE step
    * months of per-batch appends need): the LSH index via
    * [[Dedup.compactLshIndex]], the md5 hash index and the ingest
    * watermark rewritten to one `batch=<maxSeen>` subtree each with
    * the same build-aside-then-rename-swap discipline. Probe results
    * are unchanged (spec-pinned); only file/directory counts shrink.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def swapRewrite(dir: String)(write: String => Unit): Option[Long] = {
      val live = new org.apache.hadoop.fs.Path(dir)
      val fs = live.getFileSystem(conf)
      if (!fs.exists(live)) return None
      val ids = fs.listStatus(live).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith("batch=") =>
          s.stripPrefix("batch=").toLong }
      if (ids.isEmpty) return None
      val tmp = s"$dir.compacting"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      write(s"$tmp/batch=${ids.max}")
      val old = new org.apache.hadoop.fs.Path(s"$dir.precompact")
      fs.delete(old, true)
      require(fs.rename(live, old), s"rename $dir failed")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), live),
        s"rename $tmp -> $dir failed — live state is at $old")
      fs.delete(old, true)
      Some(ids.max)
    }
    val hashDir = s"$indexDir/hashes"
    val hashPrefixes = readHashPrefixes(spark, hashDir)
    val hashKeep = swapRewrite(hashDir) { out =>
      val src = spark.read.parquet(hashDir)
      if (src.schema.fieldNames.contains("hp"))
        src.select("_h", "hp").distinct()
          .repartition(col("hp"))
          .write.mode(SaveMode.Overwrite).partitionBy("hp").parquet(out)
      else src.select("_h").distinct()
        .write.mode(SaveMode.Overwrite).parquet(out)
    }
    // the meta rode the renamed-away tree; restore it, then rebuild
    // the hash bloom fresh from the compacted digests (resets fpp
    // drift from replay-superseded snapshots)
    hashKeep.foreach { keep =>
      hashPrefixes.foreach { n =>
        val p = hashMetaPath(hashDir)
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        try out.write(s"prefixes=$n\n".getBytes("UTF-8"))
        finally out.close()
      }
      RollingBloom.clear(spark, s"$indexDir/hashbloom")
      RollingBloom.roll(spark, s"$indexDir/hashbloom",
        spark.read.parquet(hashDir), "_h", Some(keep),
        hashBloomCapacity(spark), 0.03)
    }
    swapRewrite(s"$indexDir/ingest") { out =>
      // the watermark only ever needs the global max; min kept for the
      // schema contract
      spark.read.parquet(s"$indexDir/ingest")
        .agg(min("min_id").as("min_id"), max("max_id").as("max_id"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)
    }
    Dedup.compactLshIndex(spark, s"$indexDir/lsh")
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
