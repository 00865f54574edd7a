package graft

import org.apache.spark.sql.functions._

import graft.operators.SeqMatch

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
