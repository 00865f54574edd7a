package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Pins the CDC contract: snapshot = latest-per-key with tombstones
  * RETAINED, incremental apply ≡ full recompaction, stale redelivery
  * and re-apply are no-ops, SCD2 intervals tile the key's history.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  // (key, seq, op, payload) — key 1: upsert, delete, re-insert;
  // key 2: two upserts; key 3: upsert then delete (stays dead)
  private def log(rows: (Long, Long, String, String)*): DataFrame =
    rows.toDF("k", "seq", "op", "v")

  private val history = log(
    (1L, 1L, "U", "a1"), (2L, 2L, "U", "b1"), (1L, 3L, "D", "a1"),
    (3L, 4L, "U", "c1"), (1L, 5L, "U", "a2"), (2L, 6L, "U", "b2"),
    (3L, 7L, "D", "c1"))

  private def rows(df: DataFrame): Set[(Long, Long, String, String)] =
    df.select("k", "seq", "op", "v")
      .as[(Long, Long, String, String)].collect().toSet

  test("compact keeps latest per key including tombstones; current hides them") {
    val snap = Cdc.compact(history, Seq("k"), "seq")
    assert(rows(snap) == Set(
      (1L, 5L, "U", "a2"), (2L, 6L, "U", "b2"), (3L, 7L, "D", "c1")))
    assert(Cdc.current(snap, "op").select("k").as[Long].collect().toSet
      == Set(1L, 2L))
  }

  test("incremental apply equals one-shot compaction of the full history") {
    val (old, batch) =
      (history.where(col("seq") % 2 === 1), history.where(col("seq") % 2 === 0))
    val incremental =
      Cdc.applyChangelog(Cdc.compact(old, Seq("k"), "seq"), batch, Seq("k"), "seq")
    assert(rows(incremental) == rows(Cdc.compact(history, Seq("k"), "seq")))
  }

  test("stale redelivery is a no-op; tombstones block resurrection") {
    val snap = Cdc.compact(history, Seq("k"), "seq")
    // seq 1 (superseded upsert), seq 4 (upsert older than key 3's
    // tombstone at seq 7), seq 3 (superseded delete for live key 1)
    val stale = log((1L, 1L, "U", "a1"), (3L, 4L, "U", "c1"), (1L, 3L, "D", "a1"))
    assert(rows(Cdc.applyChangelog(snap, stale, Seq("k"), "seq")) == rows(snap))
  }

  test("re-applying the same batch is idempotent") {
    val batch = log((1L, 8L, "U", "a3"), (4L, 9L, "U", "d1"))
    val snap = Cdc.compact(history, Seq("k"), "seq")
    val once = Cdc.applyChangelog(snap, batch, Seq("k"), "seq")
    val twice = Cdc.applyChangelog(once, batch, Seq("k"), "seq")
    assert(rows(once) == rows(twice))
    assert(rows(once).contains((1L, 8L, "U", "a3")))
    assert(rows(once).contains((4L, 9L, "U", "d1")))
  }

  test("scd2: versions tile each key's history, deletes close but don't emit") {
    val hist = Cdc.scd2(history, Seq("k"), "seq", "op")
      .select("k", "valid_from_seq", "valid_to_seq", "is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(hist == Set(
      (1L, 1L, Some(3L), false),  // closed by the delete at seq 3
      (1L, 5L, None, true),       // re-insert is current
      (2L, 2L, Some(6L), false), (2L, 6L, None, true),
      (3L, 4L, Some(7L), false))) // key 3 ends deleted: nothing current
  }

  test("pit join: version boundaries respected, delete gap matches nothing") {
    // state changes for key 1: a1@1, deleted@4, a2@6
    val state = log((1L, 1L, "U", "a1"), (1L, 4L, "D", "a1"), (1L, 6L, "U", "a2"))
    val dim = Cdc.scd2(state, Seq("k"), "seq", "op")
      .withColumnRenamed("valid_from_seq", "seq")
    // facts at seq 2 (inside v1), 5 (inside the delete gap), 7 (inside v2)
    val facts = Seq((1L, 2L), (1L, 5L), (1L, 7L)).toDF("k", "seq")
    val got = graft.operators.AsOfJoin.asOf(facts, dim, "k", "seq")
      .where(col("right.valid_to_seq").isNull ||
        col("left.seq") < col("right.valid_to_seq"))
      .select(col("left.seq").as("fact_seq"), col("right.v").as("state"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "a1"), (7L, "a2")),
      "seq 5 falls in the delete gap and must match nothing")
  }

  test("query composition: two-phase apply matches latest-per-key on events") {
    val got = graft.queries.EventQueries.cdcState(spark, sfDir)
    val ev = Tables(spark, sfDir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("event_id").desc)
    val expect = ev
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("seq"),
        col("event_type"), col("value"))
    assert(got.count() == expect.count())
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }
}
