package graft

import java.nio.file.Files

import graft.pipeline.CorpusPipeline
import graft.streaming.StreamingFunnel

/** Round-14 operability pin: automatic index maintenance is
  * best-effort on the BACKGROUND thread — a failed fold must never
  * fail the stream — but it must not be invisible either. A
  * deterministic failure injected into every cycle (an unparsable
  * tier-size conf, hit before any fold plans) must:
  *
  *  1. surface through [[StreamingFunnel.maintenanceStats]] (total +
  *     consecutive counters, last error) while the stream drains every
  *     batch normally;
  *  2. reset the CONSECUTIVE counter on the first healthy cycle (total
  *     failures stay monotonic — the alerting signal);
  *  3. optionally escalate: with
  *     `spark.graft.funnel.failAfterMaintenanceFailures` set, the
  *     stream fails LOUDLY from the foreachBatch once that many
  *     consecutive cycles have failed, instead of growing run counts
  *     without bound forever.
  */
class MaintenanceSignalSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def w(prefix: String, i: Int): String =
    s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  private def mkDocs(tag: String, ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i,
        (1 to 40).map(w(s"$tag${('a' + (i % 26)).toChar}", _))
          .mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
  }

  private def writeSource(dir: String): Unit =
    (0 until 4).foreach { b =>
      mkDocs(s"s$b", (b * 30 + 1).toLong to (b * 30 + 8L))
        .coalesce(1).write.mode("append").parquet(dir)
    }

  test("failed background maintenance surfaces; stream stays alive") {
    val cfg = CorpusPipeline.Config()
    val (idx, out, ck, src) =
      (tmp("ms-idx"), tmp("ms-out"), tmp("ms-ck"), tmp("ms-src"))
    writeSource(src)
    val schema = mkDocs("s", Seq(1L)).schema
    spark.conf.set("spark.graft.funnel.compactEvery", "1")
    // poison: planFolds parses this before any fold — every cycle
    // throws, nothing on the batch path reads it
    spark.conf.set("spark.graft.index.tierBaseBytes", "boom")
    try {
      val stats = scala.collection.mutable.ArrayBuffer
        .empty[StreamingFunnel.BatchStats]
      val q = StreamingFunnel.attach(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        cfg, idx, out, ck, s => stats.synchronized { stats += s })
      q.awaitTermination(600000)
      StreamingFunnel.drainMaintenance()
      assert(stats.size == 4,
        s"the stream did not drain every batch: ${stats.size}")
      assert(spark.read.parquet(out).count() > 0)
      val s = StreamingFunnel.maintenanceStats(idx)
      assert(s.failures >= 2 && s.consecutiveFailures >= 2,
        s"failing cycles did not accumulate in the counter: $s")
      assert(s.lastError.exists(_.contains("NumberFormatException")),
        s"last error not surfaced: $s")
      // heal the injection: one successful cycle resets CONSECUTIVE,
      // total failures stay monotonic
      spark.conf.unset("spark.graft.index.tierBaseBytes")
      StreamingFunnel.runMaintenanceCycle(spark, idx, Long.MaxValue,
        None, rethrow = true)
      val s2 = StreamingFunnel.maintenanceStats(idx)
      assert(s2.consecutiveFailures == 0L && s2.cycles >= 1L &&
        s2.failures == s.failures,
        s"recovery did not reset the consecutive counter: $s2")
    } finally {
      spark.conf.unset("spark.graft.funnel.compactEvery")
      spark.conf.unset("spark.graft.index.tierBaseBytes")
    }
  }

  test("failAfterMaintenanceFailures escalates to a loud stream stop") {
    val cfg = CorpusPipeline.Config()
    val (idx, out, ck, src) =
      (tmp("mf-idx"), tmp("mf-out"), tmp("mf-ck"), tmp("mf-src"))
    writeSource(src)
    val schema = mkDocs("s", Seq(1L)).schema
    spark.conf.set("spark.graft.funnel.compactEvery", "1")
    spark.conf.set("spark.graft.index.tierBaseBytes", "boom")
    spark.conf.set("spark.graft.funnel.failAfterMaintenanceFailures", "2")
    try {
      val q = StreamingFunnel.attach(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        cfg, idx, out, ck)
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.awaitTermination(600000) }
      assert(e.getMessage.contains("failAfterMaintenanceFailures"),
        s"stream failed for the wrong reason: ${e.getMessage}")
    } finally {
      spark.conf.unset("spark.graft.funnel.compactEvery")
      spark.conf.unset("spark.graft.index.tierBaseBytes")
      spark.conf.unset("spark.graft.funnel.failAfterMaintenanceFailures")
    }
  }
}
