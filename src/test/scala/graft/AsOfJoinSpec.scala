package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("asof matches driver-side brute force on sf0.001") {
    val events = Tables(spark, sfDir, "events")
    val clicks = events.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")

    val got = AsOfJoin.asOf(clicks, purchases, "user_id", "ts")
      .select(col("left.event_id"), col("right.event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val cs = clicks.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val ps = purchases.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expected = cs.flatMap { case (cid, u, cts) =>
      val candidates = ps.filter(p => p._2 == u && !p._3.after(cts))
      if (candidates.isEmpty) None
      else Some(cid -> candidates.maxBy(_._3.getTime)._1)
    }.toMap
    assert(got == expected)
  }

  test("equal timestamps match (>= semantics)") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val l = Seq((1L, 10L, t)).toDF("event_id", "user_id", "ts")
    val r = Seq((2L, 10L, t)).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(l, r, "user_id", "ts").collect()
    assert(out.length == 1)
  }

  test("left rows before any right row are dropped (inner)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-03 00:00:00"))).toDF("event_id", "user_id", "ts")
    val r = Seq((9L, 10L, ts("2024-01-02 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOf(l, r, "user_id", "ts")
      .select("left.event_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  test("forward as-of picks the earliest right at-or-after, inner drop") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // -> right 8 (same instant)
      (2L, 10L, ts("2024-01-02 12:00:00")), // -> right 9 (next day)
      (3L, 10L, ts("2024-01-05 00:00:00"))) // nothing after: dropped
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (8L, 10L, ts("2024-01-01 00:00:00")),
      (9L, 10L, ts("2024-01-03 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.asOfForward(l, r, "user_id", "ts")
      .select(col("left.event_id"), col("right.event_id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(out === Set((1L, 8L), (2L, 9L)))
  }
}
