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
  * Scale posture: windowed-agg state is bounded by watermarks (late
  * data beyond 10 minutes is dropped, state for closed windows is
  * evicted); the custom stateful operator bounds its state with an
  * idle-eviction processing-time timeout (see [[runningUserTotals]]).
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
    * flatMapGroupsWithState (the arbitrary-state API the built-in aggs
    * can't express — e.g. monotone counters across triggers).
    *
    * State IS evicted: a user idle for `idleMs` of EVENT time (i.e. the
    * watermark moved `idleMs` past their last activity) has its state
    * removed, so state size tracks the active user set, not the
    * unbounded all-time population. Event-time (not processing-time)
    * timeouts on purpose: they are deterministic under replay, and
    * processing-time timers make Trigger.AvailableNow spin empty
    * micro-batches until the wall-clock timer fires. Trade-off
    * (documented, not hidden): a user returning after eviction restarts
    * its counters — pipelines needing exact all-time totals should
    * compact evicted state to a persistent store via [[toExternalSink]].
    */
  def runningUserTotals(events: Dataset[EventRow],
      idleMs: Long = 6L * 3600 * 1000): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
          GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
            val (n, tot, maxTs) = rows.foldLeft((prev.n_events, prev.total, 0L)) {
              case ((c, t, m), r) => (c + 1, t + r.value, math.max(m, r.ts.getTime))
            }
            val next = UserRunning(uid, n, tot)
            state.update(next)
            // fire once the watermark passes (user's last event + idle);
            // anchored to event time so it's legal (> watermark, since
            // the event itself was not late) and replay-deterministic
            state.setTimeoutTimestamp(maxTs + idleMs)
            Iterator.single(next)
          }
      }
  }

  final case class UserTypeStats(user_id: Long, n_events: Long,
    n_types: Long, total: Double)

  /** The Spark 4 transformWithState form of per-user running stats:
    * typed, composable state primitives (ValueState for the running
    * counters, MapState as the per-user distinct event-type set)
    * replace the single-blob GroupState of [[runningUserTotals]] —
    * each primitive is its own state-store column family, so the
    * distinct-type set grows without rewriting the counter blob on
    * every update.
    *
    * TimeMode.None here: the spec drives this with finite replayed
    * input where eviction semantics are [[runningUserTotals]]'s
    * concern. A production deployment bounds state with
    * `TTLConfig(Duration.ofHours(6))` per primitive (TTL is the
    * transformWithState replacement for timeout-based eviction) —
    * cheaper than timers because expiry happens lazily in the store.
    */
  class UserStatsProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, EventRow, UserTypeStats] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues}
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var counters: ss.ValueState[(Long, Double)] = _
    @transient private var types: ss.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      counters = getHandle.getValueState[(Long, Double)]("counters",
        Encoders.product[(Long, Double)], TTLConfig.NONE)
      types = getHandle.getMapState[String, Long]("types",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[UserTypeStats] = {
      var (n, tot) = if (counters.exists()) counters.get() else (0L, 0.0)
      rows.foreach { r =>
        n += 1
        tot += r.value
        types.updateValue(r.event_type,
          (if (types.containsKey(r.event_type)) types.getValue(r.event_type)
           else 0L) + 1L)
      }
      counters.update((n, tot))
      Iterator.single(UserTypeStats(key, n, types.keys().size, tot))
    }
  }

  /** Per-user running (event count, distinct types, value total) via
    * the transformWithState processor above; Update-mode output emits
    * one row per user per micro-batch touched.
    */
  def userStatsTws(events: Dataset[EventRow]): Dataset[UserTypeStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Stream-stream interval join: each click paired with the same
    * user's purchases from the preceding 30 minutes. Both sides are
    * watermarked and the join condition is time-bounded, so the join
    * state store holds only ~40 minutes of either stream (watermark +
    * interval) — the state-eviction contract stream-stream joins need
    * to run unbounded. On a batch DataFrame the watermark is a no-op
    * and this is a plain interval join (batch twin:
    * `events_interval_join`, DuckDB-oracle checked).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
        col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("c_ts"), col("p_ts"), col("p_value"))
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

  final case class PatternBuf(step: Int, ids: List[Long], startUs: Long,
    matchNo: Long, pending: List[(Long, String, Long)])
  final case class PatternHit(user_id: Long, match_no: Long,
    step_ids: Seq[Long], span_us: Long)

  /** Streaming CEP: the greedy skip-past-last-row sequence automaton
    * ([[graft.operators.SeqMatch.greedyMatches]] is the batch twin)
    * over a watermarked stream. Out-of-order arrival is handled the
    * only correct way for ORDER-SENSITIVE state machines: events
    * buffer in per-key state until the watermark passes them, then
    * feed the automaton in (event-time, id) order — so the match set
    * is invariant to micro-batch chopping and any intra-delay
    * disorder, and agrees exactly with the batch run (spec-pinned).
    * Per-key state = automaton registers + the above-watermark tail,
    * bounded by delay x per-key arrival rate (the bound every
    * watermarked stateful operator carries). Production adds idle
    * eviction exactly like [[runningUserTotals]]; omitted here to keep
    * completed-prefix counters exact for the parity spec.
    */
  def patternMatches(events: Dataset[EventRow], steps: Seq[String],
      delay: String = "10 minutes"): Dataset[PatternHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[PatternBuf]) =>
          val prev = state.getOption.getOrElse(PatternBuf(0, Nil, 0L, 0L, Nil))
          val incoming = rows.map { r =>
            val i = r.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L,
              r.event_type, r.event_id)
          }.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) =
            (prev.pending ++ incoming).partition(_._1 <= wmUs)
          var step = prev.step
          var ids = prev.ids
          var start = prev.startUs
          var matchNo = prev.matchNo
          val hits = List.newBuilder[PatternHit]
          ready.sortBy(e => (e._1, e._3)).foreach { e =>
            if (e._2 == steps(step)) {
              if (step == 0) start = e._1
              ids = e._3 :: ids
              step += 1
              if (step == steps.length) {
                matchNo += 1
                hits += PatternHit(uid, matchNo, ids.reverse, e._1 - start)
                step = 0
                ids = Nil
              }
            }
          }
          state.update(PatternBuf(step, ids, start, matchNo, pending))
          // a group with buffered rows but no future input must still
          // drain once the watermark passes them: anchor an event-time
          // timer just past the earliest pending event (guaranteed
          // above the current watermark, so always legal)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
          hits.result().iterator
      }
  }

  final case class AnomalyBuf(window: List[Double],
      pending: List[(Long, Long, Double)])
  final case class AnomalyAlert(user_id: Long, event_id: Long, value: Double)

  /** Streaming twin of the batch `events_anomaly` query: per-user
    * trailing-window z-score alerts as arbitrary state. Out-of-order
    * events buffer in state until the watermark passes them, then feed
    * the detector in (ts, event_id) order — the [[patternMatches]]
    * buffering discipline — so the alert set equals the batch window
    * query however the stream chops or reorders the data (spec-pinned).
    * State per user: the trailing `windowSize` values plus the pending
    * buffer (watermark-bounded) — constant-size, stream-lifetime safe.
    * The current event never enters its own baseline (the batch frame
    * is rowsBetween(-windowSize, -1)); sub-`minWindow` baselines are
    * warm-up and never alert.
    */
  def anomalyAlerts(events: Dataset[EventRow], delay: String = "10 minutes",
      windowSize: Int = 10, minWindow: Int = 5, nSd: Double = 3.0)
      : Dataset[AnomalyAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[EventRow],
         state: GroupState[AnomalyBuf]) =>
          val prev = state.getOption.getOrElse(AnomalyBuf(Nil, Nil))
          val incoming = rows.map { r =>
            val i = r.ts.toInstant
            (i.getEpochSecond * 1000000L + i.getNano / 1000L,
              r.event_id, r.value)
          }.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) =
            (prev.pending ++ incoming).partition(_._1 <= wmUs)
          var win = prev.window
          val alerts = List.newBuilder[AnomalyAlert]
          ready.sortBy(e => (e._1, e._2)).foreach { case (_, eid, v) =>
            val n = win.size
            if (n >= minWindow) {
              val mu = win.sum / n
              val sd = math.sqrt(
                win.map(x => (x - mu) * (x - mu)).sum / (n - 1))
              if (sd > 0 && math.abs(v - mu) > nSd * sd)
                alerts += AnomalyAlert(uid, eid, v)
            }
            win = (win :+ v).takeRight(windowSize)
          }
          state.update(AnomalyBuf(win, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
          alerts.result().iterator
      }
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
