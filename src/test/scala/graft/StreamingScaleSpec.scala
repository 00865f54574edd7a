package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventRow

/** Sustained-load rehearsal for the stateful streaming surface (r7
  * verdict task 5): the functional/recovery specs prove the operators
  * are CORRECT across batch boundaries; this one proves the state they
  * keep is BOUNDED under a long steady feed — the property that
  * decides whether a 100 TB/day stream runs for months or OOMs on
  * week two.
  *
  * Feed shape: 24 micro-batches x 10 000 events (240k total — two
  * decades above the parity specs' ~2k), event time advancing 5
  * minutes per batch, every 5th event a DUPLICATE of an id from the
  * previous batch (so the dedup operator has real work inside the
  * watermark horizon) and user ids cycling so sessions keep forming
  * and closing. With a 10-minute watermark delay, the horizon covers
  * ~3 batches of event time: dedup state must plateau near 3 batches'
  * ids and session state near the open-session count — NOT grow with
  * total events processed, which is the failure a correctness spec
  * over 3 batches can never see.
  */
class StreamingScaleSpec extends SparkSpec {

  private val batches = 24
  private val perBatch = 10000
  // event time advances 5 min per batch; watermark delay is 10 min
  // (EventStreams.dedupedEvents / sessionCounts), so the eviction
  // horizon spans ~3 batches of ids once the stream warms up
  private val batchMinutes = 5

  private def batchRows(b: Int): Seq[EventRow] =
    (0 until perBatch).map { i =>
      val id = b.toLong * perBatch + i
      // every 5th event re-sends an id from the PREVIOUS batch — a
      // within-horizon duplicate dropDuplicatesWithinWatermark must
      // absorb (never a new state row)
      val eventId = if (b > 0 && i % 5 == 0) id - perBatch else id
      val tsMs = (b * batchMinutes * 60L + (i % 300)) * 1000L
      // user ids rotate through 8 banks: a bank is idle 35+ minutes
      // between appearances, past the 30-min session gap, so sessions
      // actually CLOSE and leave the store (a fixed user set would
      // keep one ever-open session per user — bounded but inert)
      EventRow(eventId, new Timestamp(tsMs),
        ((b % 8) * 1000 + i % 997).toLong,
        if (i % 3 == 0) "click" else "view", i.toDouble)
    }

  /** Drive `batches` micro-batches through `transform`, recording
    * (stateRows, batchDurationMs) after each — one deterministic
    * processAllAvailable per batch, progress read from the query
    * handle (no listener race).
    */
  private def drive(name: String)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[EventRow]
    val q = transform(stream.toDF())
      .writeStream
      .queryName(name)
      .outputMode(OutputMode.Append())
      .format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"scale-$name").toString)
      .start()
    try {
      (0 until batches).map { b =>
        stream.addData(batchRows(b))
        q.processAllAvailable()
        val p = q.lastProgress
        val stateRows =
          if (p.stateOperators == null || p.stateOperators.isEmpty) 0L
          else p.stateOperators.map(_.numRowsTotal).sum
        (stateRows, p.batchDuration)
      }
    } finally q.stop()
  }

  /** The two bounded-state invariants every run must satisfy:
    * state and latency PLATEAU — the last-third maximum stays within
    * drift tolerance of the middle-third maximum (monotone growth
    * fails this immediately), plus an absolute state ceiling derived
    * from the watermark horizon.
    */
  private def assertBounded(name: String, obs: Seq[(Long, Long)],
      stateCeiling: Long): Unit = {
    val third = obs.size / 3
    val mid = obs.slice(third, 2 * third)
    val last = obs.drop(2 * third)
    val midMaxState = mid.map(_._1).max
    val lastMaxState = last.map(_._1).max
    info(s"$name: state mid-third max=$midMaxState " +
      s"last-third max=$lastMaxState ceiling=$stateCeiling; " +
      s"batch ms last-third=${last.map(_._2).mkString(",")}")
    assert(lastMaxState <= stateCeiling,
      s"$name state $lastMaxState rows exceeds horizon ceiling " +
        s"$stateCeiling — eviction not keeping up")
    assert(lastMaxState <= (midMaxState * 1.5).toLong + 1,
      s"$name state grew $midMaxState -> $lastMaxState between thirds " +
        "— monotone growth, state is leaking past the watermark")
    // latency plateau: medians, not maxes (GC/host noise spikes single
    // batches; a LEAK shows as a trend the median tracks)
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val midMs = median(mid.map(_._2))
    val lastMs = median(last.map(_._2))
    // Wall-clock assertions are host-load-dependent (ADVICE r9): the
    // always-on bound is order-of-magnitude only (a real per-batch
    // work-scales-with-history leak blows past 10x within 24 batches;
    // the deterministic state-plateau checks above are the hard gate).
    // GRAFT_STRICT_TIMING=1 restores the tight 3x band for quiet hosts.
    val (factor, slackMs) =
      if (sys.env.contains("GRAFT_STRICT_TIMING")) (3L, 500L) else (10L, 2000L)
    assert(lastMs <= midMs * factor + slackMs,
      s"$name batch latency grew ${midMs}ms -> ${lastMs}ms — " +
        "per-batch work is scaling with total history")
  }

  test("dropDuplicatesWithinWatermark under sustained load: state plateaus") {
    val obs = drive("scale_dedup")(EventStreams.dedupedEvents)
    // horizon: 10-min delay / 5-min batches => ~3 batches of ids kept
    // (the current batch plus two not yet past the watermark), x2
    // slack for eviction granularity
    assertBounded("dedup", obs, stateCeiling = 3L * 2 * perBatch)
    // and the state is REAL: warmed up, it must hold at least one full
    // batch of ids (an empty store would mean dedup stopped working)
    assert(obs.last._1 >= perBatch / 2,
      s"dedup state ${obs.last._1} suspiciously small — operator inert?")
  }

  test("session windows under sustained load: closed sessions leave state") {
    val obs = drive("scale_sessions")(EventStreams.sessionCounts)
    // open sessions: 997 users x the sessions not yet closed by the
    // watermark (30-min gap + 10-min delay = 40 min / 5-min batches =
    // ~8 batches' worth may legitimately be open), x2 slack
    assertBounded("sessions", obs, stateCeiling = 997L * 8 * 2)
  }
}
