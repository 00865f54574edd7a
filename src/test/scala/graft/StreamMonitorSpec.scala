package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamMonitor

/** The streaming observability readout: a listener-fed bounded
  * progress log whose snapshot is an ordinary DataFrame — batch ids,
  * input rows, durations, state size, watermark — plus lifecycle
  * counters. Pins that the monitor sees every batch of a real
  * (file-source, watermarked, stateful) query, that the row counts it
  * reports sum to the data actually streamed, and that the ring
  * buffer stays bounded.
  */
class StreamMonitorSpec extends SparkSpec {

  test("monitor captures per-batch progress of a stateful query") {
    val mon = new StreamMonitor().attach(spark)
    try {
      val src = Files.createTempDirectory("mon-src").toString
      val events = Tables(spark, sfDir, "events")
        .select(col("user_id"), col("ts"))
      val n = events.count()
      // two files -> two non-empty micro-batches under maxFilesPerTrigger=1
      events.where(pmod(col("user_id"), lit(2)) === 0)
        .write.mode("append").parquet(src)
      events.where(pmod(col("user_id"), lit(2)) =!= 0)
        .write.mode("append").parquet(src)
      val q = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .count()
        .writeStream
        .queryName("monitored_counts")
        .outputMode("update")
        .format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("mon-ck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // listener delivery is async; progress events may trail termination
      var tries = 0
      def snap() = mon.progress(spark).collect()
      while (snap().map(_.getAs[Long]("numInputRows")).sum < n &&
          tries < 50) { Thread.sleep(200); tries += 1 }
      val rows = snap()
      assert(rows.nonEmpty, "no progress captured")
      assert(rows.map(_.getAs[Long]("numInputRows")).sum == n,
        s"captured input rows != streamed rows ($n)")
      assert(rows.forall(_.getAs[String]("queryName") == "monitored_counts"))
      assert(rows.map(_.getAs[Long]("batchId")).distinct.length ==
        rows.length, "duplicate batch observations")
      // the stateful agg reports state rows once batches ran
      assert(rows.exists(_.getAs[Long]("stateRows") > 0),
        "state size never reported")
      assert(mon.lifecycle._1 >= 1 && mon.lifecycle._2 >= 1)
    } finally mon.detach(spark)
  }

  test("ring buffer stays bounded at capacity") {
    val mon = new StreamMonitor(capacity = 3)
    (1L to 10L).foreach { i =>
      mon.record(StreamMonitor.BatchObs("q", i, s"t$i", i, 0, 0, 1,
        0, 0, ""))
    }
    val rows = mon.progress(spark).collect()
    assert(rows.length == 3)
    // oldest dropped, newest retained
    assert(rows.map(_.getAs[Long]("batchId")).sorted.toSeq ==
      Seq(8L, 9L, 10L))
  }
}
