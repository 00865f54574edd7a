package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.KmvSketch

/** Streaming sketch-index maintenance: token batches fold into the
  * persisted per-source KMV table via foreachBatch → mergeInto.
  * K-min-of-union is associative+commutative, so the streamed state
  * must equal the one-shot batch build EXACTLY (array-for-array),
  * however the stream chopped the data — the property that makes a
  * sketch safe as incrementally-maintained state.
  */
class StreamingKmvSpec extends SparkSpec {

  test("foreachBatch mergeInto: streamed sketch state == one-shot build") {
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .cache()
    val k = 64

    val oneShot = Files.createTempDirectory("kmv-batch").toString
    KmvSketch.writeSketches(toks, "source", col("w"), k, oneShot)

    // streamed: seed with 3/4 of the docs, stream the rest in 2 batches
    val streamed = Files.createTempDirectory("kmv-stream").toString
    KmvSketch.writeSketches(
      toks.where(pmod(col("doc_id"), lit(4)) =!= 0), "source", col("w"),
      k, streamed)
    val tail = toks.where(pmod(col("doc_id"), lit(4)) === 0)
      .select("source", "w")
    val srcDir = Files.createTempDirectory("kmv-src").toString
    tail.where(length(col("w")) % 2 === 0).write.mode("append").parquet(srcDir)
    tail.where(length(col("w")) % 2 === 1).write.mode("append").parquet(srcDir)
    val q = spark.readStream
      .schema(tail.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          if (!batch.isEmpty)
            KmvSketch.mergeInto(batch, "source", col("w"), k, streamed)
      }
      .option("checkpointLocation",
        Files.createTempDirectory("kmv-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def state(dir: String) = spark.read.parquet(dir)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList)
      .toMap
    assert(state(streamed) == state(oneShot))
  }
}
