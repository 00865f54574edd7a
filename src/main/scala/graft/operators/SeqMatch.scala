package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-style sequential pattern detection over keyed event
  * streams — semantics Spark SQL lacks natively (no MATCH_RECOGNIZE
  * clause as of 4.x). Two forms with different scale contracts:
  *
  *  - the as-of-join CASCADE (built inline in EventQueries from
  *    [[AsOfJoin.asOfForward]]): each pattern step is "earliest
  *    next-step event at-or-after the previous step". Matches may
  *    overlap — every step-1 event anchors its own candidate match.
  *    Pure windowed joins: no per-key memory assumption, survives any
  *    per-key event count, and is oracle-checkable (DuckDB chained
  *    ASOF JOIN).
  *  - [[greedyMatches]] here: strict `AFTER MATCH SKIP PAST LAST ROW`
  *    semantics — non-overlapping matches, each step consumes the
  *    earliest eligible event after the previous one, the automaton
  *    restarts after a completed match (funnel semantics: events of
  *    other types between steps are skipped, not match-breaking).
  *    Inherently sequential per key: one shuffle by key, then an
  *    in-memory scan per key. Contract: one key's events fit one
  *    executor — the same per-partition contract every
  *    MATCH_RECOGNIZE engine carries.
  */
object SeqMatch {

  /** Greedy non-overlapping matching of the fixed `steps` type
    * sequence. Output: keyCol, match_no (1-based per key), one
    * `<step>_id` column per step, span_us (last-step ts minus
    * first-step ts in microseconds). Deterministic: per-key events
    * scan in (ts, id) order.
    */
  def greedyMatches(events: DataFrame, steps: Seq[String], keyCol: String,
      tsCol: String, typeCol: String, idCol: String): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.length == steps.length,
      "repeated step types are ambiguous under skip-past-last-row")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col(keyCol).cast("long"), unix_micros(col(tsCol)),
        col(typeCol), col(idCol).cast("long"))
      .as[(Long, Long, String, Long)]
    val out = typed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val evs = it.toArray.sortBy(e => (e._2, e._4))
      val matches = Seq.newBuilder[(Long, Long, Seq[Long], Long)]
      var step = 0
      var ids = List.empty[Long]
      var startUs = 0L
      var matchNo = 0L
      evs.foreach { e =>
        if (e._3 == steps(step)) {
          if (step == 0) startUs = e._2
          ids = e._4 :: ids
          step += 1
          if (step == steps.length) {
            matchNo += 1
            matches += ((key, matchNo, ids.reverse, e._2 - startUs))
            step = 0
            ids = Nil
          }
        }
      }
      matches.result().iterator
    }
    val named = out.toDF("_k", "match_no", "_ids", "span_us")
    val withSteps = steps.zipWithIndex.foldLeft(named) { case (df, (s, i)) =>
      df.withColumn(s + "_id", col("_ids")(i))
    }
    withSteps.select(
      col("_k").as(keyCol) +: col("match_no") +:
        steps.map(s => col(s + "_id")) :+ col("span_us"): _*)
  }
}
