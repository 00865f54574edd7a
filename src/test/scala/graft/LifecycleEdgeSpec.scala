package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, Dedup, IndexLifecycle, RollingBloom}
import graft.pipeline.CorpusPipeline
import graft.streaming.StreamingFunnel

/** Round-13 lifecycle edge contracts (the r12 ADVICE findings plus the
  * generalized retention):
  *
  *  1. a CREATION batch that upstream filters empty must not create a
  *     data-file-less index that crashes the next batch's probe/guard
  *     read ("Unable to infer schema") — hash, LSH and BM25 alike;
  *  2. the two append lifecycles (flat vs streaming batch=) fail fast
  *     in BOTH directions when mixed on one index;
  *  3. `spark.graft.index.keepGenerations=N` retains N previous
  *     generations — a reader pinned two generations back still
  *     completes with N=2;
  *  4. the legacy root-level entries count as the oldest generation:
  *     retained (with a marker) through the first compaction, deleted
  *     once the retention window holds real generations — and a
  *     missing pointer NEVER silently resolves to the retained
  *     snapshot (loud failure + manual restore per the error message);
  *  5. bloom geometry recorded before the first snapshot: a directory
  *     holding a meta but no snapshot (the crash order the write
  *     sequence now permits) rolls with the RECORDED geometry.
  */
class LifecycleEdgeSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def w(prefix: String, i: Int): String =
    s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(path: String): Boolean =
    fs(path).exists(new org.apache.hadoop.fs.Path(path))

  test("fully-filtered creation batch: funnel + bm25 survive to the next batch") {
    import spark.implicits._
    val cfg = CorpusPipeline.Config()
    val (idx, out, bm) = (tmp("ef-idx"), tmp("ef-out"), s"${tmp("ef-bm")}/i")
    // batch 0: rows exist but every one fails the language filter —
    // the exact/LSH/BM25 creation writes must all skip, not create
    // unreadable data-file-less trees
    val b0 = Seq((1L, (1 to 40).map(w("qa", _)).mkString(" "), "de", "web"),
        (2L, (1 to 40).map(w("qb", _)).mkString(" "), "fr", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val s0 = StreamingFunnel.processBatch(b0, 0L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(s0.nInput == 2 && s0.nLang == 0 && s0.nNear == 0)
    // batch 1: real docs — this is where the r12 code crashed
    // ("Unable to infer schema" on the empty docids/hash/bands trees)
    val b1 = Seq((10L, (1 to 40).map(w("qc", _)).mkString(" "), "en", "web"),
        (11L, (1 to 40).map(w("qd", _)).mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val s1 = StreamingFunnel.processBatch(b1, 1L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(s1.nNear == 2)
    // and a replay of the empty batch still converges
    val r0 = StreamingFunnel.processBatch(b0, 0L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(r0.nLang == 0)
    val surv = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(10L, 11L))
    val root = IndexLifecycle.resolveRoot(spark, bm)
    val n = spark.read.parquet(s"$root/stats")
      .agg(sum("n_docs")).collect()(0).getDouble(0)
    assert(n == 2.0, s"bm25 index saw $n docs")
    // batch 2 re-offers batch 1's docs: the guard (which reads docids)
    // must drop them — the other read the empty creation used to break
    val s2 = StreamingFunnel.processBatch(b1
        .withColumn("doc_id", col("doc_id") + 100L), 2L, cfg, idx, out,
      bm25Dir = Some(bm))
    assert(s2.nNear == 0, "near-dup of indexed docs must be dropped")
  }

  test("flat append onto a streaming-layout bm25 index fails fast") {
    import spark.implicits._
    val p = s"${tmp("mix-bm")}/i"
    val docs = (1L to 10L).map(i =>
        (i, (1 to 20).map(w("mx", _)).mkString(" ")))
      .toDF("doc_id", "text")
    Bm25Index.appendBatch(docs, "doc_id", "text", p, 0L)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.appendToIndex(docs.withColumn("doc_id", col("doc_id") + 10L),
        "doc_id", "text", p)
    }
    assert(e.getMessage.contains("appendBatch"),
      s"guard message should name the right lifecycle: ${e.getMessage}")
  }

  test("keepGenerations=2: a reader two compactions behind still completes") {
    import spark.implicits._
    val dir = s"${tmp("kg-idx")}/i"
    def mk(tag: String, ids: Seq[Long]) = ids.map(i =>
        (i, (1 to 25).map(w(s"$tag${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    (0 to 2).foreach(b => Dedup.appendToLshIndex(
      mk("kg", (b * 10 + 1).toLong to (b * 10 + 10L)),
      "doc_id", "text", dir, subdir = Some(b.toLong)))
    // legacy (pre-manifest) generation path — the manifest lifecycle
    // honors the same retention conf via dead-run grace cycles
    // (RunManifestSpec); here we pin the GENERATION window
    fs(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/_graft_runs"),
      false)
    Dedup.compactLshIndex(spark, dir)
    val pinnedRoot = IndexLifecycle.resolveRoot(spark, dir)
    assert(pinnedRoot.endsWith("gen-1"))
    // the reader resolves gen-1 and plans its scan NOW...
    val pinned = spark.read.parquet(s"$pinnedRoot/bands")
    spark.conf.set("spark.graft.index.keepGenerations", "2")
    try {
      // ...then two compaction commits land before it runs
      Dedup.compactLshIndex(spark, dir)
      Dedup.compactLshIndex(spark, dir)
      assert(pinned.count() > 0,
        "a reader two generations back lost its files under N=2")
      val gens = fs(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("gen-")).sorted.toSeq
      assert(gens == Seq("gen-1", "gen-2", "gen-3"),
        s"expected current + 2 previous generations, got $gens")
      // one more commit rotates gen-1 out of the window
      Dedup.compactLshIndex(spark, dir)
      val gens2 = fs(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("gen-")).sorted.toSeq
      assert(gens2 == Seq("gen-2", "gen-3", "gen-4"), s"got $gens2")
    } finally spark.conf.unset("spark.graft.index.keepGenerations")
  }

  test("legacy entries survive the first compaction; pointer loss stays loud") {
    import spark.implicits._
    val dir = s"${tmp("lr-idx")}/i"
    val docs = (1L to 20L).map(i =>
        (i, (1 to 25).map(w(s"lr${('a' + (i % 26)).toChar}", _))
          .mkString(" ")))
      .toDF("doc_id", "text")
    (0 to 1).foreach(b => Dedup.appendToLshIndex(
      docs.where(pmod(col("doc_id"), lit(2)) === b),
      "doc_id", "text", dir, subdir = Some(b.toLong)))
    // legacy (pre-manifest) generation path, as in the tests above
    fs(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/_graft_runs"),
      false)
    // a reader resolves the LEGACY root and plans its scan...
    val legacyReader = spark.read.parquet(s"$dir/bands")
    Dedup.compactLshIndex(spark, dir)
    // ...and keeps reading intact files after the first commit (r12's
    // one reader-unsafe transition, now covered by retention)
    assert(legacyReader.count() > 0,
      "first compaction stranded an in-flight legacy-root reader")
    assert(exists(s"$dir/bands") && exists(s"$dir/_graft_legacy_retained"),
      "legacy entries should be retained (marked) through the first commit")
    // but a lost pointer must NOT silently serve the retained snapshot
    val ptr = s"$dir/_graft_current"
    val gen = IndexLifecycle.currentGen(spark, dir).get
    fs(dir).delete(new org.apache.hadoop.fs.Path(ptr), false)
    val e = intercept[IllegalStateException] {
      IndexLifecycle.resolveRoot(spark, dir)
    }
    assert(e.getMessage.contains("_graft_current"),
      s"failure must name the recovery step: ${e.getMessage}")
    // manual recovery exactly as the message says
    IndexLifecycle.writeProps(spark, ptr, Seq("gen" -> gen.toString))
    assert(IndexLifecycle.resolveRoot(spark, dir).endsWith(s"gen-$gen"))
    // the second commit rotates the legacy snapshot out
    Dedup.compactLshIndex(spark, dir)
    assert(!exists(s"$dir/bands") && !exists(s"$dir/_graft_legacy_retained"),
      "legacy entries should be reclaimed once a real generation is retained")
  }

  test("bloom meta with no snapshot (crash order) rolls with recorded geometry") {
    import spark.implicits._
    val dir = tmp("bm-crash")
    // the crash state the meta-first write order can leave: geometry
    // recorded, snapshot missing
    val out = fs(dir).create(
      new org.apache.hadoop.fs.Path(s"$dir/_graft_bloom_meta"), true)
    out.write("capacity=131072\nfpp=0.03\n".getBytes("UTF-8"))
    out.close()
    val keys = (1L to 100L).toDF("k")
    RollingBloom.roll(spark, dir, keys, "k", Some(0L), -1L, 0.01)
    assert(RollingBloom.readMeta(spark, dir).contains((131072L, 0.03)),
      "roll must honor the recorded geometry, not re-derive")
    // and the next roll merges compatibly (the failure mode the old
    // order produced was IncompatibleMergeException here)
    RollingBloom.roll(spark, dir, (101L to 200L).toDF("k"), "k",
      Some(1L), -1L, 0.01)
    val b = RollingBloom.read(spark, dir).get
    assert(b.mightContainLong(5L) && b.mightContainLong(150L))
  }
}
