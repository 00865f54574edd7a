package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStreams

/** Streaming anomaly alerts == the batch trailing-window query, however
  * the stream chops or reorders the data — the parity anchor that makes
  * the monitor deployable as either a batch sweep or a live stream.
  */
class StreamingAnomalySpec extends SparkSpec {

  test("streamed alerts equal the batch window query under chopping + disorder") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 1704067200000L
    // two users, values mostly flat with planted spikes; minute spacing
    def ev(id: Long, user: Long, min: Long, v: Double) =
      EventStreams.EventRow(id, new Timestamp(base + min * 60000L),
        user, "metric", v)
    val vals1 = Seq(10.0, 10.2, 9.9, 10.1, 10.0, 10.05, 99.0, 10.1,
      10.0, 9.95, 10.02, 10.08, -50.0, 10.0)
    val vals2 = Seq(5.0, 5.1, 4.9, 5.0, 5.05, 5.02, 5.0, 4.98, 5.01, 5.0)
    val all = vals1.zipWithIndex.map { case (v, i) =>
      ev(100 + i, 1, i.toLong, v) } ++
      vals2.zipWithIndex.map { case (v, i) => ev(200 + i, 2, i.toLong, v) }

    // batch expected: the registered query's exact window semantics
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-10, -1)
    val expected = all.toDF()
      .withColumn("n", count("value").over(w))
      .withColumn("mu", avg("value").over(w))
      .withColumn("sd", stddev_samp("value").over(w))
      .where(col("n") >= 5 && col("sd") > 0 &&
        abs(col("value") - col("mu")) > lit(3.0) * col("sd"))
      .select("user_id", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expected.nonEmpty, "fixture must contain anomalies")
    assert(expected.map(_._2).contains(106L), "first spike must alert")

    // streamed: three chunks, chopped mid-window and internally shuffled
    val rnd = new scala.util.Random(11)
    val chunks = rnd.shuffle(all).grouped(9).toSeq
    val stream = MemoryStream[EventStreams.EventRow]
    val out = EventStreams.anomalyAlerts(stream.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory("anom-ckpt").toString
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    def run(): Unit = {
      val q = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStreams.AnomalyAlert],
           _: Long) =>
            got ++= b.collect().map(a => (a.user_id, a.event_id, a.value))
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    chunks.foreach { ch => stream.addData(ch); run() }
    // sentinel rounds: advance the watermark past every real event,
    // then let the timer-driven drain fire with it visible
    stream.addData(Seq(ev(900, 9, 600, 0.0))); run()
    stream.addData(Seq(ev(901, 9, 700, 0.0))); run()
    assert(got.toSet == expected)
  }
}
