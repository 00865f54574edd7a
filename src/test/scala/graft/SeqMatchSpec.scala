package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.SeqMatch
import graft.streaming.EventStreams

class SeqMatchSpec extends SparkSpec {

  test("greedy: skip-past-last-row on a handcrafted stream") {
    import spark.implicits._
    // user 1: V1 C2 V3 P4 C5 P6 — match 1 = (V1, C2, P4) (V3 skipped
    // mid-match); after P4 only C5 P6 remain, no view => no match 2.
    // user 2: C1 P2 V3 — prefix garbage, incomplete => no match.
    val ev = Seq(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L),
      (1L, 30L, "view", 3L), (1L, 40L, "purchase", 4L),
      (1L, 50L, "click", 5L), (1L, 60L, "purchase", 6L),
      (2L, 10L, "click", 1L), (2L, 20L, "purchase", 2L),
      (2L, 30L, "view", 3L)
    ).toDF("user_id", "us", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = SeqMatch.greedyMatches(ev,
        Seq("view", "click", "purchase"),
        "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 1L, 1L, 2L, 4L, 30L)))
  }

  test("greedy matches are non-overlapping and time-ordered per user") {
    val rows = graft.queries.EventQueries.patternGreedy(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "the synthetic stream must produce matches")
    rows.groupBy(_.getLong(0)).foreach { case (u, g) =>
      val ids = g.flatMap(r => Seq(r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(ids.distinct.length == ids.length,
        s"user $u: matches share an event")
      val ns = g.map(_.getLong(1)).sorted
      assert(ns.toSeq == (1L to ns.length).toSeq,
        s"user $u: match_no must be dense from 1")
    }
  }

  test("greedy agrees with a reference fold on 500 random events") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val types = Array("view", "click", "purchase", "error", "signup")
    val evs = (1L to 500L).map { id =>
      (rnd.nextInt(7).toLong, id * 7 % 5000, types(rnd.nextInt(5)), id)
    }
    val steps = Seq("view", "click", "purchase")
    // independent reference: per-user sorted fold of the same semantics
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      var step = 0; var ids = List.empty[Long]; var start = 0L; var n = 0L
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long, Long)]
      g.sortBy(e => (e._2, e._4)).foreach { e =>
        if (e._3 == steps(step)) {
          if (step == 0) start = e._2
          ids ::= e._4; step += 1
          if (step == 3) {
            n += 1
            val Seq(a, b, c) = ids.reverse
            out += ((u, n, a, b, c, e._2 - start))
            step = 0; ids = Nil
          }
        }
      }
      out
    }.toSet
    val got = SeqMatch.greedyMatches(
        evs.toDF("user_id", "us", "event_type", "event_id")
          .withColumn("ts", timestamp_micros(col("us"))),
        steps, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("streaming CEP equals the batch automaton despite chopping and disorder") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 1704067200000L
    def ev(id: Long, user: Long, min: Long, t: String) =
      EventStreams.EventRow(id, new Timestamp(base + min * 60000L), user, t, 0.0)
    val all = Seq(
      ev(1, 1, 0, "view"), ev(2, 1, 5, "click"), ev(3, 1, 7, "view"),
      ev(4, 1, 9, "purchase"), ev(5, 1, 12, "view"), ev(6, 1, 15, "click"),
      ev(7, 1, 21, "purchase"),
      ev(8, 2, 1, "click"), ev(9, 2, 3, "view"), ev(10, 2, 6, "click"),
      ev(11, 2, 8, "error"), ev(12, 2, 13, "purchase"))
    // chunks chop mid-pattern and are internally out of order
    val chunks = Seq(
      Seq(all(2), all(0), all(1), all(8), all(7)),
      Seq(all(4), all(3), all(9), all(10)),
      Seq(all(6), all(5), all(11)))
    val steps = Seq("view", "click", "purchase")

    val stream = MemoryStream[EventStreams.EventRow]
    val out = EventStreams.patternMatches(stream.toDS(), steps)
    val ckpt = java.nio.file.Files.createTempDirectory("cep-ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Seq[Long], Long)]
    def run(): Unit = {
      val q = out.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStreams.PatternHit], _: Long) =>
            got ++= b.collect()
              .map(h => (h.user_id, h.match_no, h.step_ids, h.span_us))
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    chunks.foreach { ch => stream.addData(ch); run() }
    // two sentinel rounds: the first advances the watermark past every
    // real event, the second processes with that watermark visible
    stream.addData(Seq(ev(98, 1, 600, "flush"))); run()
    stream.addData(Seq(ev(99, 2, 601, "flush"))); run()

    val batch = SeqMatch.greedyMatches(
        all.toDF().select(col("user_id"),
          col("ts"), col("event_type"), col("event_id")),
        steps, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5)))
    assert(batch.nonEmpty && got.toSet == batch.toSet,
      s"streamed ${got.toSet} != batch ${batch.toSet}")
  }

  test("greedy first match agrees with the as-of cascade at its anchor") {
    // unbounded cascade: at sf0.001 the stream is sparse, so many
    // spans exceed the registered query's 48h bound
    val funnel = graft.queries.EventQueries
      .patternCascade(spark, sfDir, boundUs = Long.MaxValue)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val greedy = graft.queries.EventQueries.patternGreedy(spark, sfDir)
      .collect()
    assert(greedy.nonEmpty)
    // every greedy match must appear in the cascade at the same view
    // anchor with the same click/purchase (both take the earliest
    // next-step event from that anchor)
    greedy.foreach { r =>
      val anchor = r.getLong(2)
      assert(funnel.get(anchor).contains((r.getLong(3), r.getLong(4))),
        s"view $anchor: cascade and greedy disagree")
    }
  }
}
