package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, IndexLifecycle, RollingBloom}
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
  *     -> (optional) survivors appended to the persisted BM25 text
  *        index — the retrieval artifact rides the same foreachBatch
  *
  * Maintenance is part of the program: [[attach]] auto-compacts the
  * cross-batch state every [[compactEvery]] batches (generation-
  * pointer commits — [[graft.operators.IndexLifecycle]] — so probes
  * racing a compaction never see an absent or half-built index), with
  * the in-flight batch's subtrees held aside so an at-least-once
  * replay of that trigger stays idempotent.
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
    *
    * `bm25Dir`: also maintain a persisted BM25 text index over the
    * emitted SURVIVORS ([[graft.operators.Bm25Index.appendBatch]]) —
    * the same `batch=<id>` overwrite idempotency as every other write
    * here, so a real ingest gets its retrieval index from the same
    * foreachBatch instead of a second standalone program.
    */
  def processBatch(batch: DataFrame, batchId: Long, cfg: CorpusPipeline.Config,
      indexDir: String, survivorsDir: String,
      bm25Dir: Option[String] = None): BatchStats = {
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
    try processBatchInner(batch, batchId, cfg, indexDir, survivorsDir,
      bm25Dir, t0)
    finally {
      val after = spark.sparkContext.getPersistentRDDs
      (after.keySet -- rddsBefore).foreach(id =>
        after.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  private def processBatchInner(batch: DataFrame, batchId: Long,
      cfg: CorpusPipeline.Config, indexDir: String, survivorsDir: String,
      bm25Dir: Option[String], t0: Long): BatchStats = {
    val spark = batch.sparkSession
    import spark.implicits._

    // ingest-order watermark: batches before this one (replay-safe:
    // own batch id excluded) — arrivals below it are out of order.
    // Every cross-batch dir resolves through IndexLifecycle: identity
    // until the first compaction, the current generation after.
    IndexLifecycle.recoverLegacySwap(spark, s"$indexDir/hashes")
    IndexLifecycle.recoverLegacySwap(spark, s"$indexDir/ingest")
    val ingestDir =
      IndexLifecycle.resolveRoot(spark, s"$indexDir/ingest")
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
    val hashDir = IndexLifecycle.resolveRoot(spark, s"$indexDir/hashes")
    val inBatch = CorpusPipeline.exactDeduped(qual)
      .withColumn("_h", md5(col("text"))).persist()
    val exact = (if (exists(spark, hashDir)) {
        val idx0 = spark.read.parquet(hashDir)
          .where(col("batch") =!= lit(batchId))
        val idx = (RollingBloom.readBroadcast(spark, s"$indexDir/hashbloom",
            Some(batchId)), readHashPrefixes(spark, hashDir)) match {
          case (Some(b), Some(p))
              if idx0.schema.fieldNames.contains("hp") =>
            val mc = udf((h: String) => b.value.mightContainString(h))
            // one partial+final collect_set — same bounded-prefix
            // discipline as the LSH probe's touched-bp collect
            val touched = inBatch.where(mc(col("_h")))
              .select(pmod(hash(col("_h")), lit(p)).as("hp"))
              .agg(collect_set(col("hp"))).collect()(0).getSeq[Int](0)
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
      if (exists(spark,
          s"${IndexLifecycle.resolveRoot(spark, lshDir)}/bands"))
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
    // the retrieval index rides the same batch: survivors only (the
    // index serves the EMITTED corpus), its own overwrite subtree,
    // its guard probing with this batch id excluded
    bm25Dir.foreach(d => graft.operators.Bm25Index.appendBatch(
      survivors, "doc_id", "text", d, batchId))
    Seq((ord.getLong(1), ord.getLong(2))).toDF("min_id", "max_id")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$ingestDir/batch=$batchId")
    BatchStats(batchId, nInput, nLang, nQuality, nExact, nNear,
      (System.nanoTime() - t0) / 1000000, nOutOfOrder)
  }

  /** Expected distinct documents for the hash index's rolling bloom —
    * `spark.graft.hash.bloomCapacity`, default AUTO (-1): the first
    * roll sizes to 16x its own key count (recorded in the bloom meta;
    * compaction re-sizes to the full corpus — [[RollingBloom.roll]]).
    * Set explicitly when the deployment corpus size is known up front;
    * over-full only degrades pruning.
    */
  def hashBloomCapacity(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.hash.bloomCapacity")
      .map(_.toLong).getOrElse(-1L)

  /** The hp-prefix modulus the hash index was built with (recorded at
    * first write, like the LSH `_graft_lsh_meta` — probes never read
    * the live conf, so a conf change cannot mis-prune). None = legacy
    * unpartitioned layout: probes fall back to the full read.
    */
  def readHashPrefixes(spark: org.apache.spark.sql.SparkSession,
      hashDir: String): Option[Int] = {
    val root = IndexLifecycle.resolveRoot(spark, hashDir)
    IndexLifecycle.readProps(spark, s"$root/_graft_hash_meta")
      .flatMap(_.get("prefixes")).map(_.toInt)
  }

  /** Write one batch's digests into the hash index: hp-prefix
    * partitioned under its own overwrite-on-replay `batch=<id>`
    * subtree, plus the rolling bloom snapshot. The unit the replay
    * spec also drives directly to simulate a half-written crash.
    */
  def writeHashBatch(hashes: DataFrame, indexDir: String,
      batchId: Long): Unit = {
    val spark = hashes.sparkSession
    val hashDir = IndexLifecycle.resolveRoot(spark, s"$indexDir/hashes")
    val prefixes = readHashPrefixes(spark, hashDir).getOrElse {
      // first write: conf, else derived from this batch's estimate
      // (floor 16 for any realistic micro-batch — compaction later
      // re-derives from the ACCUMULATED ledger, upgrading the modulus
      // as the corpus grows)
      val n = Dedup.lshPrefixesFor(hashes)
      IndexLifecycle.writeProps(spark, s"$hashDir/_graft_hash_meta",
        Seq("prefixes" -> n.toString))
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

  /** Compact the funnel's cross-batch state (maintenance, the
    * OPTIMIZE step months of per-batch appends need — [[attach]] runs
    * it automatically every [[compactEvery]] batches): the LSH index
    * via [[Dedup.compactLshIndex]], the md5 hash index and the ingest
    * watermark rewritten to one `batch=<maxSeen>` subtree each, all
    * through [[IndexLifecycle.compactInto]]'s generation-pointer
    * commit (live paths never absent, crash-safe at every point).
    * Probe results are unchanged (spec-pinned); only file/directory
    * counts shrink. Single writer by contract, between batches.
    *
    * `excludeBatch` — REQUIRED when called from inside a foreachBatch
    * (as [[attach]]'s auto-compaction does): that batch's subtrees are
    * rewritten unchanged instead of folded, because the trigger may
    * not have committed yet and a replay probes with its own batch id
    * excluded — folding the whole history under `batch=<id>` would
    * make the replay exclude ALL of it (hash + LSH probes would see an
    * empty index; the ingest watermark would count the batch's own max
    * and flag every replayed doc out-of-order).
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, excludeBatch: Option[Long] = None,
      bm25Dir: Option[String] = None): Unit = {
    def batchIds(root: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith("batch=") =>
          s.stripPrefix("batch=").toLong }
    }
    def splitSrc(src: DataFrame): (DataFrame, Option[(Long, DataFrame)]) =
      excludeBatch match {
        case Some(id) => (src.where(col("batch") =!= lit(id)),
          Some((id, src.where(col("batch") === lit(id)))))
        case None => (src, None)
      }

    val hashLogical = s"$indexDir/hashes"
    IndexLifecycle.recoverLegacySwap(spark, hashLogical)
    val hashRoot = IndexLifecycle.resolveRoot(spark, hashLogical)
    val hashFold = batchIds(hashRoot).filterNot(excludeBatch.contains)
    if (hashFold.nonEmpty) {
      val keep = hashFold.max
      // re-derive the hp modulus from the ledger's real on-disk size
      // (conf still wins) — same upgrade-as-it-grows rationale as
      // compactLshIndex; compaction rewrites every row anyway
      val prefixes = readHashPrefixes(spark, hashLogical).map { _ =>
        spark.conf.getOption("spark.graft.lsh.indexPrefixes").map(_.toInt)
          .getOrElse(IndexLifecycle.derivePrefixes(spark,
            BigInt(IndexLifecycle.dirBytes(spark, hashRoot))))
      }
      IndexLifecycle.compactInto(spark, hashLogical)(
        n => n.startsWith("batch=") || n == "_graft_hash_meta") { out =>
        val (folded, held) = splitSrc(spark.read.parquet(hashRoot))
        def writeSub(df: DataFrame, sub: Long): Unit =
          if (df.schema.fieldNames.contains("hp") && prefixes.isDefined)
            df.select(col("_h")).distinct()
              .withColumn("hp",
                pmod(hash(col("_h")), lit(prefixes.get)))
              .repartition(col("hp"))
              .write.mode(SaveMode.Overwrite).partitionBy("hp")
              .parquet(s"$out/batch=$sub")
          else df.select("_h").distinct()
            .write.mode(SaveMode.Overwrite).parquet(s"$out/batch=$sub")
        writeSub(folded, keep)
        held.foreach { case (id, df) => writeSub(df, id) }
        prefixes.foreach(n => IndexLifecycle.writeProps(spark,
          s"$out/_graft_hash_meta", Seq("prefixes" -> n.toString)))
      }
      // rebuild the hash bloom fresh from the compacted digests:
      // resets fpp drift from replay-superseded snapshots, and (auto-
      // sized geometry) re-sizes it to the full corpus. Rolled over
      // ALL digests (held-out batch included) under the folded keep
      // id: a replay sees its own digests as bloom positives — weaker
      // pruning for that one replay, never wrong results (its ROWS
      // are still dropped by the batch-partition exclusion).
      RollingBloom.clear(spark, s"$indexDir/hashbloom")
      RollingBloom.roll(spark, s"$indexDir/hashbloom",
        spark.read.parquet(IndexLifecycle.resolveRoot(spark, hashLogical)),
        "_h", Some(keep), hashBloomCapacity(spark), 0.03)
    }

    val ingLogical = s"$indexDir/ingest"
    IndexLifecycle.recoverLegacySwap(spark, ingLogical)
    val ingRoot = IndexLifecycle.resolveRoot(spark, ingLogical)
    val ingFold = batchIds(ingRoot).filterNot(excludeBatch.contains)
    if (ingFold.nonEmpty)
      IndexLifecycle.compactInto(spark, ingLogical)(
        _.startsWith("batch=")) { out =>
        // the watermark only ever needs the global max; min kept for
        // the schema contract
        val (folded, held) = splitSrc(spark.read.parquet(ingRoot))
        folded.agg(min("min_id").as("min_id"), max("max_id").as("max_id"))
          .coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/batch=${ingFold.max}")
        held.foreach { case (id, df) =>
          df.select("min_id", "max_id")
            .coalesce(1).write.mode(SaveMode.Overwrite)
            .parquet(s"$out/batch=$id")
        }
      }

    Dedup.compactLshIndex(spark, s"$indexDir/lsh", excludeBatch)
    bm25Dir.foreach(d =>
      graft.operators.Bm25Index.compactIndex(spark, d, excludeBatch))
  }

  /** Auto-compaction cadence for [[attach]] —
    * `spark.graft.funnel.compactEvery`, default every 10 micro-batches
    * (the cadence the 500k-doc scaling ledger showed keeps per-batch
    * wall flat; without ANY compaction the accumulated per-batch files
    * grow listing cost linearly in batch count — docs/SCALING.md).
    * `<= 0` disables, restoring compaction as a manual operator step.
    */
  def compactEvery(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.funnel.compactEvery")
      .map(_.toInt).getOrElse(10)

  /** Wire the funnel onto a streaming frame as a foreachBatch sink.
    * AvailableNow by default (drain the backlog, then stop — the
    * batch-parity harness shape); pass a processing-time trigger for a
    * continuously-fed deployment. Index maintenance is automatic:
    * every [[compactEvery]] batches the cross-batch state compacts in
    * place (we ARE between batches inside foreachBatch, which is
    * exactly the single-writer window [[compact]] requires) — a
    * deployment no longer degrades just because nobody scheduled the
    * OPTIMIZE step. A replayed trigger batch at the cadence point
    * re-runs compaction, which is result-invisible and idempotent.
    */
  def attach(stream: DataFrame, cfg: CorpusPipeline.Config,
      indexDir: String, survivorsDir: String, checkpointDir: String,
      onBatch: BatchStats => Unit = _ => (),
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      bm25Dir: Option[String] = None): StreamingQuery =
    stream.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          if (!batch.isEmpty) {
            onBatch(processBatch(batch.toDF(), id, cfg, indexDir,
              survivorsDir, bm25Dir))
            val every = compactEvery(batch.sparkSession)
            if (every > 0 && (id + 1) % every == 0)
              compact(batch.sparkSession, indexDir,
                excludeBatch = Some(id), bm25Dir = bm25Dir)
          }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
