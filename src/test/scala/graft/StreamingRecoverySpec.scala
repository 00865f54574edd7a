package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.EventStreams

/** File-source streaming with checkpoint recovery: the query stops,
  * new files land, a NEW query instance resumes from the checkpoint and
  * processes only the unseen files — the incremental-ingest behavior
  * the reference approximated with exists-check skipping (SURVEY O3),
  * done with real streaming offsets.
  */
class StreamingRecoverySpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("restarted query resumes from checkpoint and sees only new files") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val outName = "recovery_counts"

    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")

    def run(queryName: String): Long = {
      val stream = spark.readStream.schema(eventSchema).parquet(srcDir)
      val counts = stream.groupBy("event_type").agg(count(lit(1)).as("n"))
      val q = counts.writeStream
        .format("memory").queryName(queryName)
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName).agg(sum("n")).collect()(0).getLong(0)
    }

    events.where(col("event_id") < 600).write.mode("append").parquet(srcDir)
    val firstTotal = run(outName)
    assert(firstTotal == 600, s"first run saw $firstTotal")

    events.where(col("event_id") >= 600).write.mode("append").parquet(srcDir)
    val secondTotal = run(outName + "2")
    assert(secondTotal == 1000, s"after recovery saw $secondTotal")
  }

  test("text operators run unchanged on a stream (redact -> score -> filter)") {
    // Column-level text operators must be streaming-transparent: the
    // SAME expressions run on readStream with no code changes — the
    // streaming ingest form of the corpus-prep filter chain
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    stream.addData(Seq(
      (1L, "assorted diverse words cover many topics mail me@x.com"),
      (2L, ("spam " * 20).trim)))
    val docs = stream.toDF().toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val n = size(toks).cast("double")
    val cleaned = docs.select(
      col("doc_id"),
      graft.text.Redact.redact(col("text")).as("redacted"),
      (size(array_distinct(toks)).cast("double") / n).as("distinct_ratio"))
      .where(col("distinct_ratio") > 0.3)
    val out = EventStreams.runToMemory(cleaned, "stream_text_prep",
      OutputMode.Append()).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    assert(out.head.getString(1).contains("<EMAIL>"))
  }

  test("stream-static join: broadcast dim enrichment and blocklist anti-filter") {
    // The two stream-static shapes every ingest pipeline needs: enrich
    // arrivals against a slow dimension (inner, broadcast — no stream
    // state, re-read per micro-batch) and drop arrivals matching a
    // static blocklist (left_anti). Neither requires a watermark:
    // stream-static joins are stateless on the stream side.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    stream.addData(Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "alpha")))
    val dim = Seq(("alpha", "keep-a"), ("beta", "keep-b"), ("gamma", "bad"))
      .toDF("tag", "label")
    val block = Seq("bad").toDF("label")

    val enriched = stream.toDF().toDF("id", "tag")
      .join(broadcast(dim), "tag")
      .join(block, Seq("label"), "left_anti")
    val out = EventStreams.runToMemory(enriched,
      "stream_static_join", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("label")))
      .toSet
    assert(out == Set((1L, "keep-a"), (2L, "keep-b"), (4L, "keep-a")),
      "gamma rows must be anti-filtered, the rest labeled from the dim")
  }

  test("foreachBatch into the dynamic-partition upsert sink is idempotent") {
    import graft.sources.Sinks
    val srcDir = Files.createTempDirectory("graft-upsert-src").toString
    val sinkDir = Files.createTempDirectory("graft-upsert-sink").toString + "/t"

    Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)

    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(eventSchema).parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          Sinks.upsertPartitions(batch, sinkDir, Seq("event_type"))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce(Files.createTempDirectory("graft-upsert-ck1").toString)
    val first = spark.read.parquet(sinkDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first.values.sum > 0)

    // a FRESH checkpoint reprocesses everything: dynamic overwrite must
    // leave the sink content-identical, not doubled (the append-sink
    // failure mode)
    runOnce(Files.createTempDirectory("graft-upsert-ck2").toString)
    val second = spark.read.parquet(sinkDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == first, s"reprocess changed the sink: $first -> $second")
  }
}
