package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming drift-state maintenance: the PSI/KS inputs are per-bin
  * COUNTS, which are additive across ingest batches — so a streaming
  * deployment maintains one tiny bin-count table per slice via
  * foreachBatch merges and recomputes the metric from state, never
  * from the corpus. The pin: streamed state (seed + 2 micro-batches)
  * equals the one-shot build bin-for-bin, hence any metric computed
  * from it is identical.
  */
class StreamingDriftSpec extends SparkSpec {

  private def binCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(floor(col("n_chars") / 100).cast("long").as("bin"),
        (col("lang") === "en").as("a"))
      .groupBy("bin").agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))

  test("foreachBatch-merged bin counts == one-shot build") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars").cache()
    val state = Files.createTempDirectory("drift-state").toString
    binCounts(docs.where(pmod(col("doc_id"), lit(4)) =!= 0))
      .write.mode("overwrite").parquet(state)

    val tail = docs.where(pmod(col("doc_id"), lit(4)) === 0)
    val srcDir = Files.createTempDirectory("drift-src").toString
    tail.where(pmod(col("doc_id"), lit(8)) === 0)
      .write.mode("append").parquet(srcDir)
    tail.where(pmod(col("doc_id"), lit(8)) === 4)
      .write.mode("append").parquet(srcDir)
    val q = spark.readStream.schema(tail.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          if (!batch.isEmpty) {
            val merged = spark.read.parquet(state)
              .unionByName(binCounts(batch))
              .groupBy("bin").agg(sum("na").as("na"), sum("nb").as("nb"))
              .localCheckpoint(true) // materialize before overwriting
            merged.write.mode("overwrite").parquet(state)
          }
      }
      .option("checkpointLocation",
        Files.createTempDirectory("drift-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    assert(m(spark.read.parquet(state)) == m(binCounts(docs)))
  }
}
