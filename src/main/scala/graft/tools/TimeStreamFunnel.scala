package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline
import graft.streaming.StreamingFunnel

/** Dev utility: the months-of-ingest rehearsal for the incremental
  * corpus funnel — 50 id-ordered micro-batches of 10 000 docs each
  * (500 000 docs total, one decade above Scale100Spec's streamed pin)
  * driven straight through [[StreamingFunnel.processBatch]] against
  * the persisted hash + bloom-guarded partitioned LSH indexes. The
  * per-batch wall-clock curve is the deliverable (docs/SCALING.md):
  * flat = per-batch work tracks the batch; a positive slope isolates
  * whatever still scales with ingested history.
  *
  * Corpus: 100 disjoint token-renamed shards of the sf0.01 documents
  * table (the Time100 construction, 2-letter tags), two shards per
  * batch — near-dup density constant, shards share no shingles, ids
  * globally increasing across batches (the parity norm).
  */
object TimeStreamFunnel {

  def shard(spark: SparkSession, base: String, s: Int) = {
    val tag = s"q${('a' + s / 26).toChar}${('a' + s % 26).toChar}"
    val b = graft.Tables(spark, base, "documents")
      .select("doc_id", "text", "lang", "source")
    (0 until 10).map { r =>
      b.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
      .select((col("doc_id") + lit(s * 1000000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$tag$$1").as("text"),
        col("lang"), col("source"))
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nBatches = if (args.length > 1) args(1).toInt else 50
    // compact the persisted indexes every N batches (0 = never;
    // -1 = the r12 AUTO path: FULL compaction at the attach() cadence,
    // in-flight batch held out; -2 = the r13 AUTO path: TIERED
    // maintenance at the same cadence — what attach() now runs by
    // default) — the A/B lever for the ledger: full compaction's
    // per-cycle cost grows with the index, tiered maintenance's with
    // the data appended since the last cycle
    val compactEvery = if (args.length > 2) args(2).toInt else 0
    // 4th arg "bm25": also maintain the streamed BM25 text index over
    // the survivors (processBatch bm25Dir) — the full ingest program
    val withBm25 = args.length > 3 && args(3) == "bm25"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CorpusPipeline.Config()
    val indexDir = java.nio.file.Files
      .createTempDirectory("tsf-idx").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("tsf-out").toString
    val bm25Dir = if (withBm25) Some(java.nio.file.Files
      .createTempDirectory("tsf-bm25").toString + "/idx") else None
    val maintThreads = scala.collection.mutable.ArrayBuffer.empty[Thread]
    println(s"TSF start: $nBatches batches x 2 shards (10k docs each), " +
      s"index=$indexDir bm25=${bm25Dir.getOrElse("off")}")
    (0 until nBatches).foreach { b =>
      val batch = shard(spark, base, 2 * b)
        .unionByName(shard(spark, base, 2 * b + 1))
        .localCheckpoint(true)
      val s = StreamingFunnel.processBatch(batch, b.toLong, cfg,
        indexDir, outDir, bm25Dir)
      println(s"TSF b=${s.batchId} in=${s.nInput} lang=${s.nLang} " +
        s"qual=${s.nQuality} exact=${s.nExact} near=${s.nNear} " +
        s"ooo=${s.nOutOfOrder} ms=${s.ms}")
      if (compactEvery > 0 && b > 0 && b % compactEvery == 0) {
        val t0 = System.nanoTime()
        StreamingFunnel.compact(spark, indexDir, bm25Dir = bm25Dir)
        println(f"TSF compact after b=$b ms=${(System.nanoTime() - t0) / 1000000}")
      } else if (compactEvery == -1) {
        val every = StreamingFunnel.compactEvery(spark)
        if (every > 0 && (b + 1) % every == 0) {
          val t0 = System.nanoTime()
          StreamingFunnel.compact(spark, indexDir,
            excludeBatch = Some(b.toLong), bm25Dir = bm25Dir)
          println(f"TSF auto-compact after b=$b " +
            f"ms=${(System.nanoTime() - t0) / 1000000}")
        }
      } else if (compactEvery == -2) {
        val every = StreamingFunnel.compactEvery(spark)
        if (every > 0 && (b + 1) % every == 0) {
          val t0 = System.nanoTime()
          val folds = StreamingFunnel.maintain(spark, indexDir,
            excludeFrom = b.toLong, bm25Dir = bm25Dir)
          println(f"TSF tiered-maintain after b=$b folds=$folds " +
            f"ms=${(System.nanoTime() - t0) / 1000000}")
        }
      } else if (compactEvery == -3) {
        // the attach() default: tiered maintenance on a BACKGROUND
        // thread — per-batch wall at the cadence boundary is the
        // decoupling evidence (ingest never stalls for a fold)
        val every = StreamingFunnel.compactEvery(spark)
        if (every > 0 && (b + 1) % every == 0) {
          val bb = b
          val t = new Thread(() => {
            val t0 = System.nanoTime()
            val folds = StreamingFunnel.maintain(spark, indexDir,
              excludeFrom = bb.toLong, bm25Dir = bm25Dir)
            println(f"TSF async-maintain after b=$bb folds=$folds " +
              f"ms=${(System.nanoTime() - t0) / 1000000}")
          }, s"tsf-maintain-$b")
          t.setDaemon(false)
          t.start()
          maintThreads += t
        }
      }
    }
    maintThreads.foreach(_.join(600000))
    val total = spark.read.parquet(outDir).count()
    println(s"TSF done: $total survivors over ${nBatches * 10000} docs")
    bm25Dir.foreach { d =>
      // the streamed text index must serve and count exactly the
      // emitted survivors (stats partials sum across batch subtrees);
      // probe with the corpus's own top term — the ledger shards are
      // token-renamed, so no fixed English term exists in them
      import org.apache.spark.sql.functions.{desc, sum => fsum}
      val n = graft.operators.Bm25Index.table(spark, d, "stats")
        .agg(fsum("n_docs")).collect()(0).getDouble(0)
      val topTerm = graft.operators.Bm25Index.table(spark, d, "dfs")
        .groupBy("term").agg(fsum("dft").as("d"))
        .orderBy(desc("d")).limit(1).collect()(0).getString(0)
      val hits = graft.operators.Bm25Index.query(spark, d,
        Seq(topTerm), 10).count()
      println(s"TSF bm25: n_docs=$n (survivors=$total) " +
        s"topk_rows=$hits (term=$topTerm)")
    }
    spark.stop()
  }
}
