package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, Dedup, IndexLifecycle}
import graft.pipeline.CorpusPipeline
import graft.streaming.StreamingFunnel

/** Round-12 contracts of the shared persisted-index lifecycle
  * ([[IndexLifecycle]] — the one implementation behind the LSH, md5
  * and BM25 indexes' meta + compaction):
  *
  *  1. generation-pointer compaction: a probe RACING `compact()` never
  *     errors and always reads one complete index generation (the old
  *     two-rename swap had a window where the live path was absent);
  *  2. pre-generation crash states heal: an old-code crash that parked
  *     history at `<dir>.precompact` is recovered by the next
  *     append/probe instead of being mistaken for index creation
  *     (which silently orphaned all history);
  *  3. previous-generation retention follows
  *     `spark.graft.index.keepPreviousGeneration`;
  *  4. a funnel trigger batch REPLAYED after auto-compaction (crash
  *     between the compact and the checkpoint commit) still converges
  *     to the clean state — compaction holds the in-flight batch's
  *     subtrees aside instead of folding them under its own id.
  */
class IndexLifecycleSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def w(prefix: String, i: Int): String =
    s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("props roundtrip and absent-file read") {
    val dir = tmp("props")
    assert(IndexLifecycle.readProps(spark, s"$dir/nope").isEmpty)
    IndexLifecycle.writeProps(spark, s"$dir/meta",
      Seq("prefixes" -> "16", "fpp" -> "0.01"))
    assert(IndexLifecycle.readProps(spark, s"$dir/meta")
      .contains(Map("prefixes" -> "16", "fpp" -> "0.01")))
  }

  test("probe racing compaction never errors, reads a full generation") {
    import spark.implicits._
    val dir = tmp("race-idx")
    def mk(tag: String, ids: Seq[Long]) = ids.map(i =>
        (i, (1 to 30).map(w(s"$tag${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    (0 to 2).foreach { b =>
      Dedup.appendToLshIndex(mk("rc", (b * 20 + 1).toLong to (b * 20 + 20L)),
        "doc_id", "text", dir, subdir = Some(b.toLong))
    }
    // exercise the LEGACY (r12, pre-manifest) generation machinery:
    // dropping the run manifest makes compactLshIndex take the
    // generation-pointer rewrite (the manifest fold path has its own
    // race pin in RunManifestSpec)
    fs(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/_graft_runs"),
      false)
    Dedup.compactLshIndex(spark, dir)
    assert(IndexLifecycle.currentGen(spark, dir).contains(1L))

    // probe: a near-dup of an indexed doc (non-empty result pins that
    // every interleaved read saw real data, not an empty fallback)
    val probe = mk("rc", Seq(1L)).withColumn("doc_id", lit(900L))
    def probeRows() = Dedup
      .dedupAgainstIndex(probe, "doc_id", "text", dir, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val expected = probeRows()
    assert(expected.nonEmpty, "fixture drift: planted near-dup not found")

    @volatile var failure: Option[Throwable] = None
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Set[(Long, Long, Double)]]()
    val prober = new Thread(() =>
      try (1 to 10).foreach(_ => results.add(probeRows()))
      catch { case t: Throwable => failure = Some(t) })
    prober.start()
    // compact repeatedly while the probes run
    (1 to 3).foreach(_ => Dedup.compactLshIndex(spark, dir))
    prober.join(300000)
    assert(failure.isEmpty,
      s"a probe racing compact() failed: ${failure.map(_.toString)}")
    assert(results.size == 10)
    results.forEach(r => assert(r == expected,
      s"racing probe read a torn generation: $r vs $expected"))
    // retention default: current + previous generation only
    val gens = fs(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("gen-")).sorted
    val cur = IndexLifecycle.currentGen(spark, dir).get
    assert(gens.toSeq == Seq(s"gen-${cur - 1}", s"gen-$cur"),
      s"expected exactly the current + previous generations, got " +
        gens.mkString(","))
  }

  test("keepPreviousGeneration=false reclaims the old generation at commit") {
    import spark.implicits._
    val dir = tmp("reclaim-idx")
    val docs = (1L to 30L).map(i =>
        (i, (1 to 25).map(w(s"kp${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.appendToLshIndex(docs, "doc_id", "text", dir, subdir = Some(0L))
    // legacy (pre-manifest) generation path, as in the race test above
    fs(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/_graft_runs"),
      false)
    spark.conf.set("spark.graft.index.keepPreviousGeneration", "false")
    try {
      Dedup.compactLshIndex(spark, dir)
      Dedup.compactLshIndex(spark, dir)
      val gens = fs(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("gen-")).toSeq
      assert(gens == Seq("gen-2"),
        s"expected only the current generation, got ${gens.mkString(",")}")
    } finally spark.conf.unset("spark.graft.index.keepPreviousGeneration")
  }

  test("old-code crash parked at .precompact: next append recovers history") {
    import spark.implicits._
    // the ADVICE scenario: the pre-generation compactIndex crashed
    // between its two renames' COMPLETION — history sits at
    // <p>.precompact, the live path is gone. The next append used to
    // compute creation = !exists(postings) and silently initialize a
    // fresh index containing only that batch.
    val p = tmp("adv-bm25")
    val docs = (1L to 40L).map(i =>
        (i, (1 to 20).map(w(s"av${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    Bm25Index.write(docs.where(col("doc_id") <= 30), "doc_id", "text", p)
    val f = fs(p)
    require(f.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(s"$p.precompact")))
    Bm25Index.appendToIndex(docs.where(col("doc_id") > 30),
      "doc_id", "text", p, dedupeAgainstExisting = true)
    val n = spark.read.parquet(
        s"${IndexLifecycle.resolveRoot(spark, p)}/stats")
      .agg(sum("n_docs")).collect()(0).getDouble(0)
    assert(n == 40.0,
      s"append after a parked-precompact crash saw $n docs — history " +
        "was orphaned instead of recovered")
  }

  test("crash between the old renames: complete build is finished forward") {
    import spark.implicits._
    // NOT pre-created: the crash state has the live path ABSENT
    val p = s"${tmp("fwd-bm25")}/idx"
    val docs = (1L to 20L).map(i =>
        (i, (1 to 20).map(w(s"fw${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    // the "old" state: stale history at .precompact, the COMPLETE
    // compacted build at .compacting, live missing
    Bm25Index.write(docs.where(col("doc_id") <= 10), "doc_id", "text",
      s"$p.precompact")
    Bm25Index.write(docs, "doc_id", "text", s"$p.compacting")
    IndexLifecycle.recoverLegacySwap(spark, p)
    val n = spark.read.parquet(
        s"${IndexLifecycle.resolveRoot(spark, p)}/stats")
      .agg(sum("n_docs")).collect()(0).getDouble(0)
    assert(n == 20.0, "forward recovery must install the complete build")
    assert(!f(s"$p.precompact") && !f(s"$p.compacting"),
      "recovery must clean up the crash leftovers")
  }

  private def f(path: String): Boolean =
    fs(path).exists(new org.apache.hadoop.fs.Path(path))

  test("prefix modulus derives from input size and re-derives at compaction") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val probe = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("doc_id", col("doc_id") + 10000000L)
    // tiny target: the sf0.001 corpus (~64 KB parquet estimate) must
    // derive ABOVE the 16 floor
    spark.conf.set("spark.graft.index.prefixTargetBytes", "1024")
    try {
      val dir = s"${tmp("derive")}/idx"
      Dedup.writeLshIndex(docs, "doc_id", "text", dir)
      val m = Dedup.readLshMeta(spark, dir).get
      assert(m.prefixes > 16 && Integer.bitCount(m.prefixes) == 1,
        s"expected a derived power-of-two modulus above the floor, " +
          s"got ${m.prefixes}")
      assert(Dedup.dedupAgainstIndex(probe, "doc_id", "text", dir, 0.5)
        .count() > 0, "derived layout must still find the planted dups")

      // a streaming index born tiny (huge target -> the 16 floor)
      // upgrades its modulus when compaction re-derives from the
      // ACCUMULATED on-disk bytes — probe results unchanged
      spark.conf.set("spark.graft.index.prefixTargetBytes",
        (1L << 30).toString)
      val sdir = s"${tmp("derive-s")}/idx"
      (0 to 2).foreach { b =>
        Dedup.appendToLshIndex(
          docs.where(pmod(col("doc_id"), lit(3)) === b),
          "doc_id", "text", sdir, subdir = Some(b.toLong))
      }
      assert(Dedup.readLshMeta(spark, sdir).get.prefixes == 16)
      def probeRows() = Dedup
        .dedupAgainstIndex(probe, "doc_id", "text", sdir, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val before = probeRows()
      assert(before.nonEmpty)
      spark.conf.set("spark.graft.index.prefixTargetBytes", "1024")
      Dedup.compactLshIndex(spark, sdir)
      val m2 = Dedup.readLshMeta(spark, sdir).get
      assert(m2.prefixes > 16 && Integer.bitCount(m2.prefixes) == 1,
        s"compaction must re-derive the modulus, got ${m2.prefixes}")
      assert(probeRows() == before,
        "modulus upgrade changed probe results")
    } finally spark.conf.unset("spark.graft.index.prefixTargetBytes")
  }

  test("trigger batch replayed after auto-compaction converges to clean state") {
    import spark.implicits._
    val cfg = CorpusPipeline.Config()
    def doc(id: Long, words: Seq[String]) =
      (id, words.mkString(" "), "en", "web")
    val base = (1 to 60).map(w("rp", _))
    val b0 = Seq(doc(1L, base), doc(2L, (1 to 60).map(w("zq", _))))
      .toDF("doc_id", "text", "lang", "source")
    // batch 1: near-dup of doc 1 + a fresh doc — the probe MUST still
    // see doc 1 in the index after its replay
    val b1 = Seq(doc(10L, base.take(55) ++ (1 to 5).map(w("nn", _))),
        doc(11L, (1 to 60).map(w("ff", _))))
      .toDF("doc_id", "text", "lang", "source")

    def state(idxDir: String, outDir: String) = {
      val surv = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // manifest-aware: after a fold the run depths are mixed and dead
      // runs linger — a raw glob would conflict or double-count
      val root = IndexLifecycle.resolveRoot(spark, s"$idxDir/hashes")
      val hashes = (graft.operators.RunManifest.read(spark, root) match {
        case Some(m) => graft.operators.RunManifest
          .readData(spark, root, "", m.live, Seq("_h"))
        case None => spark.read.parquet(root).select("_h")
      }).collect().map(_.getString(0)).sorted.toSeq
      (surv, hashes)
    }

    // clean twin: no compaction at all
    val (idxA, outA) = (tmp("rac-a-idx"), tmp("rac-a-out"))
    StreamingFunnel.processBatch(b0, 0L, cfg, idxA, outA)
    val cleanB1 = StreamingFunnel.processBatch(b1, 1L, cfg, idxA, outA)

    // crashed run: batch 1 lands fully, auto-compaction runs (as
    // attach does, excluding the in-flight batch), THEN the trigger
    // "crashes" before checkpoint commit and batch 1 replays
    val (idxB, outB) = (tmp("rac-b-idx"), tmp("rac-b-out"))
    StreamingFunnel.processBatch(b0, 0L, cfg, idxB, outB)
    StreamingFunnel.processBatch(b1, 1L, cfg, idxB, outB)
    StreamingFunnel.compact(spark, idxB, excludeBatch = Some(1L))
    val replayB1 = StreamingFunnel.processBatch(b1, 1L, cfg, idxB, outB)
    assert((replayB1.nInput, replayB1.nExact, replayB1.nNear,
        replayB1.nOutOfOrder) ==
      (cleanB1.nInput, cleanB1.nExact, cleanB1.nNear, cleanB1.nOutOfOrder),
      "replayed stats diverged — compaction folded the in-flight " +
        "batch's state under its own id")
    assert(state(idxB, outB)._1 == state(idxA, outA)._1,
      "survivors diverged after a replay-after-compaction")
    assert(state(idxB, outB)._2 == state(idxA, outA)._2,
      "hash index diverged after a replay-after-compaction")
  }
}
