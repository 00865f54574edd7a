package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventRow

/** Batch-stream parity (SURVEY.md §5.2 item 6): the same transform over
  * a MemoryStream must agree with the batch run on events.parquet, and
  * the watermark must drop late rows.
  */
class EventStreamsSpec extends SparkSpec {

  private def batchEvents = Tables(spark, sfDir, "events")

  private def toRows(limit: Int): Seq[EventRow] = {
    batchEvents.orderBy("event_id").limit(limit).collect().map { r =>
      EventRow(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))
    }.toSeq
  }

  test("tumbling window: streaming result equals batch result") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = toRows(2000)
    val stream = MemoryStream[EventRow]
    stream.addData(rows)
    val streamed = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream.toDF()), "tumbling_parity",
      OutputMode.Append())
    val batch = EventStreams.tumblingCounts(
      batchEvents.orderBy("event_id").limit(2000)
        .select("event_id", "ts", "user_id", "event_type", "value"))
    val a = streamed.orderBy("w_start", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("w_start", "event_type").collect().map(_.toSeq)
    // append-mode emits only watermark-closed windows; batch has all.
    // Every streamed window must match the batch value, and the closed
    // prefix must cover all but the last (open) watermark horizon.
    val bm = b.map(s => (s(0), s(2)) -> s).toMap
    assert(a.nonEmpty)
    a.foreach(s => assert(bm((s(0), s(2))) == s))
    val lastTs = rows.map(_.ts.getTime).max
    val horizon = lastTs - 10 * 60 * 1000
    val expectedClosed = b.filter(
      _(1).asInstanceOf[Timestamp].getTime <= horizon)
    assert(a.length == expectedClosed.length,
      s"closed-window count ${a.length} vs expected ${expectedClosed.length}")
  }

  test("late rows beyond the watermark are dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = new Timestamp(1704067200000L) // 2024-01-01 00:00:00 UTC
    def ev(id: Long, offsetMin: Long) = EventRow(
      id, new Timestamp(base.getTime + offsetMin * 60000), 1L, "click", 1.0)
    val stream = MemoryStream[EventRow]
    // batch 1 advances watermark to 50-10=40 min; batch 2's row at 10
    // min is behind the watermark and must be dropped.
    stream.addData(Seq(ev(1, 0), ev(2, 6), ev(3, 50)))
    val out = EventStreams.tumblingCounts(stream.toDF())
    val q = out.writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    stream.addData(Seq(ev(4, 10))) // late: window [10,15) < watermark 40
    val q2 = out.writeStream.format("memory").queryName("late_drop2")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val emitted = spark.table("late_drop").union(spark.table("late_drop2"))
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(emitted == 2, s"expected only the two closed on-time rows, got $emitted")
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = new Timestamp(1704067200000L)
    def ev(id: Long, user: Long, offsetMin: Long) = EventRow(
      id, new Timestamp(base.getTime + offsetMin * 60000), user, "view", 1.0)
    val stream = MemoryStream[EventRow]
    stream.addData(Seq(
      ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 70), // user 1: two sessions
      ev(4, 2, 0), // user 2: one session
      ev(5, 9, 600))) // sentinel far in the future closes watermark
    val out = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream.toDF()), "sessions",
      OutputMode.Append())
    val sess = out.where(col("user_id") < 9)
      .orderBy("user_id", "sess_start").collect()
    assert(sess.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("streaming dedup within watermark removes duplicate event ids") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = new Timestamp(1704067200000L)
    def ev(id: Long, offsetMin: Long) = EventRow(
      id, new Timestamp(base.getTime + offsetMin * 60000), 1L, "click", 1.0)
    val stream = MemoryStream[EventRow]
    stream.addData(Seq(ev(1, 0), ev(1, 1), ev(2, 2), ev(1, 3), ev(3, 4)))
    val out = EventStreams.runToMemory(
      EventStreams.dedupedEvents(stream.toDF()), "dedup_stream",
      OutputMode.Append())
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("foreachBatch external sink receives batches with stable ids") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = new Timestamp(1704067200000L)
    val stream = MemoryStream[EventRow]
    stream.addData(Seq(
      EventRow(1, base, 1, "click", 1.0), EventRow(2, base, 2, "view", 2.0)))
    val received = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    EventStreams.toExternalSink(stream.toDF(), "ext_sink") { (batch, id) =>
      received += ((id, batch.count()))
    }
    assert(received.nonEmpty && received.map(_._2).sum == 2)
    assert(received.map(_._1).distinct.length == received.length)
  }

  test("mapGroupsWithState running totals accumulate across triggers") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = new Timestamp(1704067200000L)
    val stream = MemoryStream[EventRow]
    stream.addData(Seq(
      EventRow(1, base, 1, "a", 2.0), EventRow(2, base, 1, "a", 3.0),
      EventRow(3, base, 2, "a", 5.0)))
    val out = EventStreams.runningUserTotals(stream.toDS())
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    stream.addData(Seq(EventRow(4, base, 1, "a", 5.0)))
    val q2 = out.writeStream.format("memory").queryName("running2")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val last = spark.table("running2").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last(1L) == (3L, 10.0)) // state carried: 2 events + 1 more
  }
}
