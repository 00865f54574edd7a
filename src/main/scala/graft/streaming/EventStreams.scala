package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs over the events stream (SURVEY.md §2.2
  * Streaming [EXT]). Every transform takes a DataFrame so the SAME code
  * runs on `spark.read` (batch) and `spark.readStream` (incremental) —
  * batch-stream parity is the correctness anchor (EventStreamsSpec
  * feeds a MemoryStream and compares with the batch run).
  *
  * Scale posture: state is bounded by watermarks (late data beyond 10
  * minutes is dropped, state for closed windows is evicted); the
  * sessionization keeps one small state object per user key.
  */
object EventStreams {

  /** Tumbling 5-minute counts per event type, watermarked. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding windows (10 min window, 5 min slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"))

  /** Gap-based session windows (30 min inactivity), built-in operator. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Streaming dedup by event_id within the watermark horizon. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  /** Custom stateful aggregation: running per-user totals via
    * mapGroupsWithState (the arbitrary-state API the built-in aggs
    * can't express — e.g. monotone counters across triggers).
    */
  def runningUserTotals(events: Dataset[EventRow]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, tot) = rows.foldLeft((prev.n_events, prev.total)) {
            case ((c, t), r) => (c + 1, t + r.value)
          }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** External-service egress via foreachBatch — the ONLY place the
    * engine keeps a foreach-style side effect (SURVEY.md O8: the
    * reference's per-element upload closures become declarative sinks;
    * true external egress gets the micro-batch hook). The handler
    * receives (batchDF, batchId); batchId is stable across retries so
    * handlers can be idempotent (write-once per id).
    */
  def toExternalSink(df: DataFrame, name: String)(
      handler: (DataFrame, Long) => Unit): Unit = {
    val q = df.writeStream
      .queryName(name)
      .outputMode(OutputMode.Update())
      .foreachBatch(handler)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Output-mode helper used by the spec: run a streaming DataFrame to
    * completion against a memory sink and return the result table.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
