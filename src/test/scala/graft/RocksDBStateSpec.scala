package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventRow

/** The streaming operators on the RocksDB state store provider — the
  * backend a production deployment uses so state size is bounded by
  * local disk, not executor heap (100 TB posture: hundreds of millions
  * of stream keys don't fit in JVM memory; RocksDB spills them and
  * supports changelog checkpointing). Results must be identical to the
  * default HDFS-backed in-memory provider.
  */
class RocksDBStateSpec extends SparkSpec {

  test("windowed aggregation is provider-agnostic (RocksDB == default)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = 1704067200000L
      def ev(id: Long, offsetMin: Long, typ: String) =
        EventRow(id, new Timestamp(base + offsetMin * 60000), 1L, typ, 1.0)
      val rows = (0L until 100L).map(i => ev(i, i, if (i % 2 == 0) "a" else "b"))
      val stream = MemoryStream[EventRow]
      stream.addData(rows)
      val streamed = EventStreams.runToMemory(
        EventStreams.tumblingCounts(stream.toDF()), "rocksdb_tumbling",
        OutputMode.Append())
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.tumblingCounts(rows.toDF())
      // streamed (append mode) emits only watermark-closed windows;
      // every emitted window must match the batch computation exactly
      val batchSet = batch.collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batchSet),
        s"rocksdb rows diverge: ${streamed.diff(batchSet)}")
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running stats converge to the batch aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState REQUIRES the RocksDB provider (multi-column-
    // family state); the default HDFS provider rejects it at start
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = 1704067200000L
      def ev(id: Long, user: Long, typ: String, v: Double) =
        EventRow(id, new Timestamp(base + id * 60000), user, typ, v)
      val batch1 = Seq(
        ev(0, 1, "click", 1.0), ev(1, 1, "view", 2.0), ev(2, 2, "click", 3.0))
      val batch2 = Seq(
        ev(3, 1, "click", 4.0), ev(4, 2, "buy", 5.0), ev(5, 2, "click", 6.0))
      val stream = MemoryStream[EventRow]
      stream.addData(batch1)
      stream.addData(batch2)
      val out = EventStreams.runToMemory(
        EventStreams.userStatsTws(stream.toDS()).toDF(), "tws_stats",
        OutputMode.Update())
        .as[EventStreams.UserTypeStats].collect()
      // update mode re-emits per batch: the LAST row per user is the
      // converged running state and must equal the batch groupBy
      val last = out.groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(r => (r.n_events, r.n_types))
      }
      assert(last(1L).n_events === 3L && last(1L).n_types === 2L &&
        math.abs(last(1L).total - 7.0) < 1e-9)
      assert(last(2L).n_events === 3L && last(2L).n_types === 2L &&
        math.abs(last(2L).total - 14.0) < 1e-9)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
