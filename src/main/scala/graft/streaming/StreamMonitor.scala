package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability: a bounded in-memory progress log fed by a
  * `StreamingQueryListener` — the operational readout (rows/sec, batch
  * duration, state size, watermark lag) every production streaming
  * deployment monitors and alerts on. Spark already EMITS all of this
  * per micro-batch; this module only retains and tabulates it, so the
  * overhead is one listener callback per batch.
  *
  * Design constraints, both deliberate:
  *  - BOUNDED driver state: a ring buffer of the last `capacity`
  *    batches per query (default 256). A monitor that grows with
  *    stream lifetime is itself a leak — long-lived queries run for
  *    months.
  *  - The readout is a plain DataFrame (`progress()`), so alert rules
  *    are ordinary queries over it (e.g. max batch duration, rows/sec
  *    trend, watermark lag percentiles) and can be shipped anywhere a
  *    DataFrame goes.
  */
object StreamMonitor {
  /** One micro-batch observation (fields chosen to match the
    * QueryProgressEvent names operators know).
    */
  final case class BatchObs(queryName: String, batchId: Long,
      timestamp: String, numInputRows: Long, inputRowsPerSecond: Double,
      processedRowsPerSecond: Double, batchDurationMs: Long,
      stateRows: Long, stateBytes: Long, watermark: String)
}

final class StreamMonitor(capacity: Int = 256)
    extends StreamingQueryListener {
  import StreamMonitor.BatchObs

  require(capacity > 0, s"capacity must be positive, got $capacity")

  private val buf = mutable.Queue.empty[BatchObs]
  private var started = 0L
  private var terminated = 0L

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    synchronized { started += 1 }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    synchronized { terminated += 1 }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val (srows, sbytes) =
      if (p.stateOperators == null || p.stateOperators.isEmpty) (0L, 0L)
      else (p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.memoryUsedBytes).sum)
    val wm = Option(p.eventTime)
      .flatMap(m => Option(m.get("watermark"))).getOrElse("")
    record(BatchObs(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.timestamp, p.numInputRows, nan0(p.inputRowsPerSecond),
      nan0(p.processedRowsPerSecond), p.batchDuration,
      srows, sbytes, wm))
  }

  /** Ring-buffer insert (factored out so the bound is testable without
    * fabricating Spark's private progress events).
    */
  private[graft] def record(obs: BatchObs): Unit = synchronized {
    buf.enqueue(obs)
    while (buf.size > capacity) buf.dequeue()
  }

  private def nan0(x: Double): Double = if (x.isNaN) 0.0 else x

  /** Snapshot of the retained batch observations as a DataFrame. */
  def progress(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val snap = synchronized { buf.toSeq }
    snap.toDF()
  }

  /** (started, terminated) lifecycle counters. */
  def lifecycle: (Long, Long) = synchronized { (started, terminated) }

  /** Convenience: register on a session; remember to `detach`. */
  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit =
    spark.streams.removeListener(this)
}
