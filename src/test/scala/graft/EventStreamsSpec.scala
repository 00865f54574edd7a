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
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-running-ckpt").toString
    val stream = MemoryStream[EventRow]
    stream.addData(Seq(
      EventRow(1, base, 1, "a", 2.0), EventRow(2, base, 1, "a", 3.0),
      EventRow(3, base, 2, "a", 5.0)))
    val out = EventStreams.runningUserTotals(stream.toDS())
    // foreachBatch sink: unlike the memory sink it supports resuming
    // from a checkpoint, which is what lets run 2 carry run 1's state
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def run(): Unit = {
      val q = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.UserRunning], _: Long) =>
          got ++= b.collect().map(u => (u.user_id, u.n_events, u.total)); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    stream.addData(Seq(EventRow(4, base, 1, "a", 5.0)))
    run()
    val last = got.map(t => t._1 -> (t._2, t._3)).toMap // later wins
    assert(last(1L) == (3L, 10.0)) // state carried: 2 events + 1 more
  }

  test("idle users are evicted by event-time timeout, counters restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 1704067200000L
    def ev(id: Long, user: Long, offsetMin: Long) =
      EventRow(id, new Timestamp(base + offsetMin * 60000), user, "a", 1.0)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-evict-ckpt").toString
    val stream = MemoryStream[EventRow]
    val out = EventStreams.runningUserTotals(stream.toDS(),
      idleMs = 30 * 60000) // 30 min idle eviction
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def run(): Unit = {
      got.clear()
      val q = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.UserRunning], _: Long) =>
          got ++= b.collect().map(u => (u.user_id, u.n_events, u.total)); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stream.addData(Seq(ev(1, 1, 0), ev(2, 1, 1)))
    run() // user 1: (2, 2.0); timeout armed at min 31
    // watermark driver: min 120 event pushes watermark to min 110,
    // past user 1's timeout -> state removed
    stream.addData(Seq(ev(3, 99, 120)))
    run()
    // user 1 returns at min 125: fresh state, counters restart
    stream.addData(Seq(ev(4, 1, 125)))
    run()
    val rows = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(rows(1L) == (1L, 1.0), s"expected restarted counters, got $rows")
  }

  test("stream-stream interval join matches batch on the same rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC
    def ev(id: Long, user: Long, offsetMin: Long, typ: String, v: Double) =
      EventRow(id, new Timestamp(base + offsetMin * 60000), user, typ, v)
    val clicks = Seq(
      ev(1, 1, 40, "click", 0.0), ev(2, 1, 100, "click", 0.0),
      ev(3, 2, 50, "click", 0.0),
      // late driver row to advance both watermarks past the join rows
      ev(9, 9, 300, "click", 0.0))
    val purchases = Seq(
      ev(4, 1, 20, "purchase", 5.0),  // within 30min of click 1 only
      ev(5, 1, 95, "purchase", 7.0),  // within 30min of click 2
      ev(6, 2, 10, "purchase", 9.0),  // 40min before click 3: out of range
      ev(8, 9, 300, "purchase", 1.0))
    val cs = MemoryStream[EventRow]; cs.addData(clicks)
    val ps = MemoryStream[EventRow]; ps.addData(purchases)
    val streamed = EventStreams.runToMemory(
      EventStreams.clickPurchaseJoin(cs.toDF(), ps.toDF()),
      "ssjoin_parity", OutputMode.Append())
    val batch = EventStreams.clickPurchaseJoin(
      clicks.toDF(), purchases.toDF())
    val a = streamed.select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = batch.select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b === Set((1L, 4L), (2L, 5L), (9L, 8L)))
    assert(a === b)
  }
}
