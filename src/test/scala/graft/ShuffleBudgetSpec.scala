package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Quantitative shuffle budgets for flagship operators: the plan
  * guards pin SHAPE (what joins/aggregates appear); these pin VOLUME —
  * a refactor that accidentally drags the text/embedding payload into
  * an exchange can keep the same plan shape yet shuffle 100x the
  * bytes, and nothing else in CI would notice. Bounds are ~5x the
  * measured sf0.001 value, so they fail on a categorical regression
  * (payload in the shuffle), not on jitter.
  *
  * Note on measurement: listener events drain asynchronously; the
  * sleep undercounts at worst, and an undercount can only make an
  * UPPER-bound assert pass — no false failures.
  */
class ShuffleBudgetSpec extends SparkSpec {

  private def shuffleWriteBytes(body: => Unit): Long = {
    val bytes = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      Thread.sleep(1000) // let the listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  private def measured(name: String): Long =
    shuffleWriteBytes(SparkEntry.queries(name)(spark, sfDir).count())

  test("bm25 shuffles query-term hits, never the corpus text") {
    val b = measured("text_bm25_topk")
    info(s"text_bm25_topk shuffle write: $b bytes")
    assert(b < (1L << 20), s"$b bytes — did the text column enter an exchange?")
  }

  test("keyword top-k shuffles (word, count) partials only") {
    val b = measured("text_keyword_topk")
    info(s"text_keyword_topk shuffle write: $b bytes")
    assert(b < (1L << 20), s"$b bytes")
  }

  test("quantile bins shuffle ranks, not a corpus-wide sorted window") {
    val b = measured("stats_quantile_bins")
    info(s"stats_quantile_bins shuffle write: $b bytes")
    assert(b < (8L << 20), s"$b bytes")
  }

  test("centroids shuffle (label, dim) partials, never embeddings") {
    val b = measured("emb_centroid")
    info(s"emb_centroid shuffle write: $b bytes")
    assert(b < (4L << 20), s"$b bytes")
  }

  test("span dedup shuffles digests and indices, not text") {
    val b = measured("dedup_exact_spans")
    info(s"dedup_exact_spans shuffle write: $b bytes")
    assert(b < (16L << 20), s"$b bytes")
  }
}
