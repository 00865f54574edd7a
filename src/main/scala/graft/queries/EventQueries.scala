package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics on the `events` table — batch versions of the
  * streaming jobs (graft.streaming runs the same aggregations with
  * readStream + watermark; batch-parity is the correctness anchor,
  * SURVEY.md §5.2 item 6).
  */
object EventQueries {

  /** JSON scalar functions over the props column. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Tumbling 5-minute window aggregation (batch form of the streaming
    * job; `window()` is the same expression Structured Streaming uses).
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Sessionization via window functions: a session breaks after 30
    * minutes of inactivity. Pure timestamp comparisons (no float epoch
    * math) so both engines agree bit-exactly.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = Tables(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
    flagged
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("sess_start"),
        max("ts").as("sess_end"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** As-of join: each click matched to the user's most recent purchase
    * at-or-before the click (single-shuffle union+window composition,
    * oracle = DuckDB's native ASOF JOIN).
    */
  def asofClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    graft.operators.AsOfJoin.asOf(clicks, purchases, "user_id", "ts")
      .select(
        col("left.event_id").as("click_id"),
        col("left.user_id").as("user_id"),
        col("right.event_id").as("purchase_id"),
        // Tie semantics on money-like scale-2 values (ADVICE r9):
        // RoundAwayFromZero rounds half-away on the SCALED BINARY
        // double — a stored 2.675 (binary ≈ 2.67499999...) rounds to
        // 2.67, where builtin round()'s decimal HALF_UP gives 2.68.
        // This engine standardizes on the binary reading because it is
        // the arithmetic DuckDB (and most engines' DOUBLE round)
        // perform; callers needing ledger-grade decimal HALF_UP should
        // store DecimalType, not DOUBLE.
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(col("right.value"), 2).as("purchase_value"),
        (unix_micros(col("left.ts")) - unix_micros(col("right.ts")))
          .as("gap_us"))
      .orderBy("click_id")
  }

  /** Forward as-of: each click matched to the user's NEXT purchase
    * at-or-after the click.
    */
  def asofForwardClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val clicks = events.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    graft.operators.AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts")
      .select(
        col("left.event_id").as("click_id"),
        col("left.user_id").as("user_id"),
        col("right.event_id").as("purchase_id"),
        org.apache.spark.sql.graftx.RoundAwayFromZero
          .column(col("right.value"), 2).as("purchase_value"),
        (unix_micros(col("right.ts")) - unix_micros(col("left.ts")))
          .as("gap_us"))
      .orderBy("click_id")
  }

  /** Nearest-direction as-of (pandas merge_asof direction='nearest'):
    * each click takes whichever of its backward / forward purchase
    * matches is closer in time, ties to backward — composed from the
    * two directional as-ofs by a keyed full-outer pick, so the cost is
    * the two single-shuffle as-ofs plus one click-keyed join. Clicks
    * with no purchase on either side drop (inner overall).
    */
  def asofNearestClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val b = asofClickPurchase(spark, dir)
      .select(col("click_id"), col("user_id").as("b_uid"),
        col("purchase_id").as("b_pid"), col("purchase_value").as("b_val"),
        col("gap_us").as("b_gap"))
    val f = asofForwardClickPurchase(spark, dir)
      .select(col("click_id"), col("user_id").as("f_uid"),
        col("purchase_id").as("f_pid"), col("purchase_value").as("f_val"),
        col("gap_us").as("f_gap"))
    val takeB = col("f_gap").isNull ||
      (col("b_gap").isNotNull && col("b_gap") <= col("f_gap"))
    b.join(f, Seq("click_id"), "full")
      .select(col("click_id"),
        coalesce(col("b_uid"), col("f_uid")).as("user_id"),
        when(takeB, col("b_pid")).otherwise(col("f_pid")).as("purchase_id"),
        when(takeB, col("b_val")).otherwise(col("f_val"))
          .as("purchase_value"),
        when(takeB, col("b_gap")).otherwise(col("f_gap")).as("gap_us"),
        when(takeB, lit("backward")).otherwise(lit("forward"))
          .as("direction"))
      .orderBy("click_id")
  }

  /** Tolerance-bounded as-of (pandas merge_asof tolerance semantics):
    * nearest match first, then matches farther than 1 hour drop.
    */
  def asofToleranceClickPurchase(spark: SparkSession, dir: String): DataFrame =
    asofClickPurchase(spark, dir)
      .where(col("gap_us") <= 3600L * 1000000L)
      .orderBy("click_id")

  /** Batch twin of the stream-stream interval join (same code path —
    * the watermark is a no-op in batch), aggregated per click.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val joined = graft.streaming.EventStreams.clickPurchaseJoin(
      events.where(col("event_type") === "click"),
      events.where(col("event_type") === "purchase"))
    joined
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("p_value"), 2).as("sum_purchase"))
      .orderBy("click_id")
  }

  /** Native session_window aggregation — the builtin that subsumes the
    * hand-rolled lag/cumsum sessionization AND runs under Structured
    * Streaming with state-store session merging. Both spellings are
    * registered so the oracle pins them to the same gap semantics
    * (session end = last event + gap).
    */
  def sessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  /** Funnel conversion: share of clicking users who purchase within 30
    * minutes of SOME click. The conversion test is a time-bounded
    * left-semi join on user_id — the same single-shuffle interval-join
    * shape as events_interval_join, aggregated to one row.
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("pts"))
    val converted = clicks.join(purchases,
        col("user_id") === col("p_uid") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"),
        "left_semi")
      .agg(count_distinct(col("user_id")).as("converted_users"))
    val clickUsers = clicks
      .agg(count_distinct(col("user_id")).as("click_users"))
    clickUsers.crossJoin(converted)
      .select(col("click_users"), col("converted_users"),
        round(col("converted_users").cast("double") / col("click_users"), 4)
          .as("conversion_rate"))
  }

  /** Per-user rolling mean over the trailing 5 events — the time-series
    * smoothing primitive; the window is keyed per user (parallel by
    * user_id), never a global ordering.
    */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-4, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        round(avg("value").over(w), 4).as("rolling_avg"))
      .orderBy("user_id", "event_id")
  }

  /** Streaming-style anomaly detection, batch twin: events whose value
    * deviates more than 3 trailing standard deviations from the user's
    * own trailing-10-event baseline (current row excluded; windows
    * with fewer than 5 prior events are warm-up and never flag) — the
    * per-entity outlier monitor a metrics pipeline runs. One per-user
    * window pass, no global ordering; the flag is a filter, so the
    * output is alert-sized, not corpus-sized.
    */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-10, -1)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("n", count("value").over(w))
      .withColumn("mu", avg("value").over(w))
      .withColumn("sd", stddev_samp("value").over(w))
      .where(col("n") >= 5 && col("sd") > 0 &&
        abs(col("value") - col("mu")) > lit(3.0) * col("sd"))
      // output only engine-stable columns: `value` is the raw parquet
      // double; the window mean/stddev are ulp-divergent across engines
      // (summation order), so emitting them — rounded or raw — is the
      // cross-engine boundary-flip hazard. WHICH rows alert is the
      // substance the oracle checks.
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy("user_id", "event_id")
  }

  /** Time-series gap filling: per-user daily event counts over a fixed
    * two-week window with missing days materialized as zero — the
    * dense-grid prep step for downstream models. The day spine is a
    * generated literal sequence (broadcast); the only corpus-sized
    * work is one (user, day) hash aggregation.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events").where(col("user_id") < 20)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val days = spark.range(1).select(explode(sequence(
      lit("2024-01-01").cast("date"), lit("2024-01-14").cast("date"),
      expr("interval 1 day"))).as("d"))
    val users = ev.select("user_id").distinct()
    val counts = ev
      .where(col("d").between("2024-01-01", "2024-01-14"))
      .groupBy("user_id", "d").agg(count(lit(1)).as("n_events"))
    users.crossJoin(broadcast(days))
      .join(counts, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("user_id", "d")
  }

  /** Cohort retention: users grouped by first-seen day, activity
    * counted per 7-day offset from THEIR cohort day — the standard
    * retention triangle. Two shuffles total: the per-user min (hash
    * agg) and the user-keyed join back (NOT broadcast: the cohort
    * table scales with the user population), then one count-distinct
    * agg on the tiny (cohort, offset) key domain. Week offsets are
    * day-arithmetic (floor(days/7)), not calendar-week truncation, so
    * engine week-start conventions can't skew parity.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        floor(datediff(col("d"), col("cohort_day")) / lit(7.0))
          .as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_day", "week_offset")
  }

  /** Incremental rollup maintenance: the standing aggregate table is
    * never recomputed from raw history — a new batch contributes its
    * own (count, sum, min, max) partials and the two partial sets merge
    * by re-aggregation (count/sum add, min/max fold, avg derived at
    * read time from the merged sums). Here the 80/20 event split plays
    * "existing rollup" and "new arrivals"; the oracle aggregates the
    * raw union directly, proving the merged state is indistinguishable
    * from a full recompute. At 100 TB this is the difference between
    * touching a day of data and touching all of it.
    */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    def partials(df: DataFrame): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("value").as("s"),
        min("value").as("mn"), max("value").as("mx"))
    val existing = partials(ev.where(pmod(col("event_id"), lit(5)) =!= 0))
    val batch = partials(ev.where(pmod(col("event_id"), lit(5)) === 0))
    existing.unionByName(batch)
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        round(sum("s"), 4).as("sum_value"),
        round(sum("s") / sum("n"), 6).as("avg_value"),
        round(min("mn"), 6).as("min_value"),
        round(max("mx"), 6).as("max_value"))
      .orderBy("event_type")
  }

  /** ML feature engineering: lagged values and short rolling stats per
    * user in ONE window pass (one shuffle on user_id, one sort, every
    * feature reuses the frame). Ordered by event_id — a total order
    * both engines agree on exactly, immune to the ns-vs-us timestamp
    * precision gap between the parquet file and Spark's TimestampType.
    */
  def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val w5 = w.rowsBetween(-4, Window.currentRow)
    Tables(spark, dir, "events")
      .where(col("user_id") < 40)
      .select(col("user_id"), col("event_id"), col("value"),
        round(lag("value", 1).over(w), 6).as("lag1"),
        round(lag("value", 3).over(w), 6).as("lag3"),
        round(avg("value").over(w5), 6).as("roll_mean5"),
        round(max("value").over(w5), 6).as("roll_max5"),
        count(lit(1)).over(w5).as("roll_n5"))
      .orderBy("user_id", "event_id")
  }

  /** A/B-test readout: users split into variants by id parity, Welch's
    * t statistic computed from per-variant (n, mean, sample variance) —
    * ONE hash agg over the events, then a 2-row self-arrangement via
    * conditional aggregation; the test statistic is closed-form column
    * arithmetic. No collect, no per-variant scans: the pattern for
    * experiment readouts over event logs at any scale.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(pmod(col("user_id"), lit(2)).as("variant"))
      .agg(count(lit(1)).cast("double").as("n"),
        avg("value").as("m"), var_samp("value").as("v"))
      .agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 0, col("m"))).as("m0"),
        max(when(col("variant") === 1, col("m"))).as("m1"),
        max(when(col("variant") === 0, col("v"))).as("v0"),
        max(when(col("variant") === 1, col("v"))).as("v1"))
      .select(
        col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
        round(col("m0"), 6).as("mean0"), round(col("m1"), 6).as("mean1"),
        round((col("m1") - col("m0")) /
          sqrt(col("v1") / col("n1") + col("v0") / col("n0")), 6)
          .as("t_stat"))

  /** Activity heatmap: (day-of-week, hour-of-day) event matrix — the
    * ops-dashboard rollup; one hash agg on a 7x24-bounded key domain.
    * Spark numbers weekdays 1=Sunday..7, DuckDB 0..6: the oracle
    * shifts by one rather than papering over the convention gap.
    */
  def heatmap(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("dow", "hod")

  /** The events table read as a CDC changelog: key = user_id, sequence
    * = event_id (globally ordered), op = delete tombstone on "error"
    * events, payload = (event_type, value). Shared by the CDC queries.
    */
  private def changelog(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("user_id"),
      col("event_id").as("seq"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
        .as("op"),
      col("event_type"), col("value"))

  /** Incremental CDC snapshot maintenance: compact 80% of the
    * changelog into a snapshot, merge the remaining 20% as a batch
    * ([[graft.operators.Cdc.applyChangelog]] — batch-sized work, not
    * history-sized), read the live state. The %5 split interleaves the
    * two sequences on purpose: per key the batch may hold only STALE
    * changes, which must lose to the snapshot's newer row (tombstones
    * included) — the oracle is a one-shot latest-per-key over the full
    * history, so any resurrection or stale overwrite hash-mismatches.
    */
  def cdcState(spark: SparkSession, dir: String): DataFrame = {
    val ev = changelog(spark, dir)
    val snap = graft.operators.Cdc.compact(
      ev.where(pmod(col("seq"), lit(5)) =!= 0), Seq("user_id"), "seq")
    val next = graft.operators.Cdc.applyChangelog(
      snap, ev.where(pmod(col("seq"), lit(5)) === 0), Seq("user_id"), "seq")
    graft.operators.Cdc.current(next, "op").orderBy("user_id")
  }

  /** SCD type-2 dimension history from the same changelog: one version
    * row per upsert with [valid_from_seq, valid_to_seq) bounds, deletes
    * closing but not emitting. One shuffle + per-key sort.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.scd2(
      changelog(spark, dir).where(col("user_id") < 40),
      Seq("user_id"), "seq", "op")
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from_seq"), col("valid_to_seq"), col("is_current"))
      .orderBy("user_id", "valid_from_seq")

  /** Point-in-time (temporal) join: each click event joined to the
    * state version that was valid WHEN IT HAPPENED — the offline
    * feature-store correctness rule (no leakage from future state).
    * Dimension = SCD2 history of the user's non-click changes; facts =
    * clicks. Shape: the single-shuffle as-of composition picks the
    * latest version with valid_from <= seq, and one residual filter
    * handles tombstone gaps (a click after a delete matches NOTHING —
    * an earlier version can't contain it because versions tile
    * disjointly). The oracle is the full inequality range join, so any
    * leakage across a version boundary or through a delete gap
    * hash-mismatches.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = changelog(spark, dir)
    val dim = graft.operators.Cdc
      .scd2(ev.where(col("event_type") =!= "click"), Seq("user_id"), "seq", "op")
      .withColumnRenamed("valid_from_seq", "seq")
    val clicks = ev.where(col("event_type") === "click")
      .select("user_id", "seq", "value")
    graft.operators.AsOfJoin.asOf(clicks, dim, "user_id", "seq")
      .where(col("right.valid_to_seq").isNull ||
        col("left.seq") < col("right.valid_to_seq"))
      .select(
        col("left.user_id").as("user_id"),
        col("left.seq").as("click_seq"),
        col("left.value").as("click_value"),
        col("right.event_type").as("state_type"),
        col("right.value").as("state_value"),
        col("right.seq").as("valid_from_seq"))
      .orderBy("user_id", "click_seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_pit_join" -> pitJoin,
    "events_cdc_state" -> cdcState,
    "events_scd2_history" -> scd2History,
    "events_heatmap" -> heatmap,
    "events_ab_test" -> abTest,
    "events_lag_features" -> lagFeatures,
    "events_incremental_merge" -> incrementalMerge,
    "events_retention" -> retention,
    "events_gap_fill" -> gapFill,
    "events_rolling_avg" -> rollingAvg,
    "events_anomaly" -> anomalies,
    "events_funnel_conversion" -> funnelConversion,
    "events_session_window" -> sessionWindowNative,
    "events_json_props" -> jsonProps,
    "events_tumbling_window" -> tumblingWindow,
    "events_sessionize" -> sessionize,
    "events_asof_join" -> asofClickPurchase,
    "events_asof_forward" -> asofForwardClickPurchase,
    "events_asof_nearest" -> asofNearestClickPurchase,
    "events_asof_tolerance" -> asofToleranceClickPurchase,
    "events_pattern_funnel" -> patternFunnel,
    "events_funnel_latency" -> funnelLatency,
    "events_markov_transitions" -> markovTransitions,
    "events_pattern_greedy" -> patternGreedy,
    "events_decayed_value" -> decayedValue,
    "events_interval_join" -> intervalJoin)

  /** Exponentially time-decayed per-user value (tau = 7 days, anchored
    * at the stream's max timestamp) — the feature-store recency
    * primitive: one broadcast scalar + one hash aggregation, decay
    * weights computed row-locally inside the scan. 6dp rounding
    * absorbs engine summation order.
    */
  def decayedValue(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val tauUs = 7.0 * 86400e6
    val m = ev.agg(max("ts").as("m"))
    ev.crossJoin(broadcast(m))
      .groupBy("user_id")
      .agg(
        round(sum(col("value") *
          exp(-(unix_micros(col("m")) - unix_micros(col("ts"))) / lit(tauUs))),
          6).as("decayed_value"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Sequence pattern view -> click -> purchase within 48 hours, as a
    * cascade of forward as-of joins (each step = earliest next-step
    * event at-or-after the previous one; matches may overlap). The
    * Spark-first MATCH_RECOGNIZE: windowed joins instead of a per-key
    * state machine — no per-key memory contract, oracle = DuckDB
    * chained ASOF JOIN. 48 h ~= the 25th percentile of unbounded spans
    * on the synthetic stream, so the bound genuinely filters while
    * keeping the result populated at every SF.
    */
  def patternFunnel(spark: SparkSession, dir: String): DataFrame =
    patternCascade(spark, dir, boundUs = 48L * 3600L * 1000000L)

  /** Time-to-convert distribution over the funnel matches: exact
    * p50/p90/p99 of view->purchase spans — the conversion-latency
    * readout a funnel dashboard leads with. Reuses the as-of cascade;
    * the global percentiles run over the MATCH table (funnel-count
    * rows, not event rows), so the unpartitioned percentile sort is
    * bounded by match cardinality at any scale. percentile_cont /
    * quantile_cont parity established by agg_percentiles.
    */
  /** First-order Markov transition matrix over per-user event-type
    * sequences: counts and row-normalized probabilities of each
    * (from_type -> to_type) step — the behavioral-model readout
    * (what usually follows a view? how absorbing is an error?).
    * Scale shape: consecutive steps via a PER-USER lead window (one
    * user-keyed exchange), then a hash agg to the type-pair matrix
    * (|types|^2 rows); the row normalization windows over THAT tiny
    * matrix, never the event stream.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .where(col("to_type").isNotNull)
    val g = steps.groupBy(col("event_type").as("from_type"),
        col("to_type"))
      .agg(count(lit(1)).as("n"))
    g.withColumn("p", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")).cast("double"), 6))
      .orderBy("from_type", "to_type")
  }

  def funnelLatency(spark: SparkSession, dir: String): DataFrame =
    patternCascade(spark, dir, boundUs = 48L * 3600L * 1000000L)
      .agg(
        count(lit(1)).as("n_funnels"),
        round(expr(
          "percentile_cont(0.5) WITHIN GROUP (ORDER BY span_us)"), 4)
          .as("p50_us"),
        round(expr(
          "percentile_cont(0.9) WITHIN GROUP (ORDER BY span_us)"), 4)
          .as("p90_us"),
        round(expr(
          "percentile_cont(0.99) WITHIN GROUP (ORDER BY span_us)"), 4)
          .as("p99_us"))

  private[graft] def patternCascade(spark: SparkSession, dir: String,
      boundUs: Long): DataFrame = {
    val ev = Tables(spark, dir, "events")
    def typed(t: String, idName: String) = ev
      .where(col("event_type") === t)
      .select(col("event_id").as(idName), col("user_id"), col("ts"))
    val vc = graft.operators.AsOfJoin.asOfForward(
        typed("view", "view_id"), typed("click", "click_id"),
        "user_id", "ts")
      .select(
        col("left.view_id").as("view_id"),
        col("left.user_id").as("user_id"),
        col("left.ts").as("v_ts"),
        col("right.click_id").as("click_id"),
        col("right.ts").as("ts"))
    graft.operators.AsOfJoin.asOfForward(
        vc, typed("purchase", "purchase_id"), "user_id", "ts")
      .select(
        col("left.view_id").as("view_id"),
        col("left.user_id").as("user_id"),
        col("left.click_id").as("click_id"),
        col("right.purchase_id").as("purchase_id"),
        (unix_micros(col("right.ts")) - unix_micros(col("left.v_ts")))
          .as("span_us"))
      .where(col("span_us") <= boundUs)
      .orderBy("view_id")
  }

  /** The same pattern under strict MATCH_RECOGNIZE "skip past last
    * row" semantics: non-overlapping greedy matches via
    * [[graft.operators.SeqMatch.greedyMatches]]. Oracle-checked: the
    * sequential consumption IS SQL-expressible as a DuckDB recursive
    * CTE that advances one complete match per recursion round (three
    * LATERAL earliest-next lookups past the previous match's last
    * consumed event) — see the `events_pattern_greedy` entry in
    * [[oracle]]; SeqMatchSpec additionally pins the semantics and the
    * funnel-cascade agreement.
    */
  def patternGreedy(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SeqMatch.greedyMatches(
        Tables(spark, dir, "events"),
        Seq("view", "click", "purchase"),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "match_no")

  val oracle: Map[String, String] = Map(
    "events_pit_join" ->
      """WITH chg AS (
  SELECT user_id, event_id AS seq, event_type, value
  FROM events WHERE event_type <> 'click'),
hist AS (
  SELECT user_id, seq, event_type, value,
    lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to_seq
  FROM chg),
ver AS (SELECT * FROM hist WHERE event_type <> 'error'),
clicks AS (
  SELECT user_id, event_id AS seq, value FROM events
  WHERE event_type = 'click')
SELECT c.user_id, c.seq AS click_seq, c.value AS click_value,
  v.event_type AS state_type, v.value AS state_value,
  v.seq AS valid_from_seq
FROM clicks c JOIN ver v
  ON c.user_id = v.user_id AND v.seq <= c.seq
  AND (v.valid_to_seq IS NULL OR c.seq < v.valid_to_seq)
ORDER BY c.user_id, click_seq""",
    "events_cdc_state" ->
      """WITH ranked AS (
  SELECT user_id, event_id AS seq, event_type, value,
    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, seq, event_type, value
FROM ranked WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id""",
    "events_scd2_history" ->
      """WITH hist AS (
  SELECT user_id, event_type, value, event_id AS valid_from_seq,
    lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
      AS valid_to_seq
  FROM events WHERE user_id < 40)
SELECT user_id, event_type, value, valid_from_seq, valid_to_seq,
  valid_to_seq IS NULL AS is_current
FROM hist WHERE event_type <> 'error'
ORDER BY user_id, valid_from_seq""",
    "events_heatmap" ->
      """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
  CAST(hour(ts) AS INT) AS hod,
  count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY dow, hod""",
    "events_ab_test" ->
      """WITH byv AS (
  SELECT user_id % 2 AS variant,
    CAST(count(*) AS DOUBLE) AS n, avg(value) AS m, var_samp(value) AS v
  FROM events GROUP BY 1
), w AS (
  SELECT
    max(CASE WHEN variant = 0 THEN n END) AS n0,
    max(CASE WHEN variant = 1 THEN n END) AS n1,
    max(CASE WHEN variant = 0 THEN m END) AS m0,
    max(CASE WHEN variant = 1 THEN m END) AS m1,
    max(CASE WHEN variant = 0 THEN v END) AS v0,
    max(CASE WHEN variant = 1 THEN v END) AS v1
  FROM byv
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
  round(m0, 6) AS mean0, round(m1, 6) AS mean1,
  round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) AS t_stat
FROM w""",
    "events_lag_features" ->
      """SELECT user_id, event_id, value,
  round(lag(value, 1) OVER w, 6) AS lag1,
  round(lag(value, 3) OVER w, 6) AS lag3,
  round(avg(value) OVER w5, 6) AS roll_mean5,
  round(max(value) OVER w5, 6) AS roll_max5,
  count(*) OVER w5 AS roll_n5
FROM events WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
  w5 AS (PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id""",
    "events_incremental_merge" ->
      """SELECT event_type, count(*) AS n_events,
  round(sum(value), 4) AS sum_value,
  round(sum(value) / count(*), 6) AS avg_value,
  round(min(value), 6) AS min_value,
  round(max(value), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type""",
    "events_retention" ->
      """WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
), coh AS (
  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id
)
SELECT c.cohort_day,
  CAST(floor(date_diff('day', c.cohort_day, e.d) / 7.0) AS BIGINT)
    AS week_offset,
  count(DISTINCT e.user_id) AS n_active
FROM ev e JOIN coh c USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_day, week_offset""",
    "events_gap_fill" ->
      """WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-14',
    INTERVAL 1 DAY)) AS DATE) AS d
), users AS (
  SELECT DISTINCT user_id FROM events WHERE user_id < 20
), c AS (
  SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
  FROM events
  WHERE user_id < 20
    AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-14'
  GROUP BY 1, 2
)
SELECT u.user_id, days.d, coalesce(c.n, 0) AS n_events
FROM users u CROSS JOIN days
LEFT JOIN c ON c.user_id = u.user_id AND c.d = days.d
ORDER BY u.user_id, days.d""",
    "events_anomaly" ->
      """WITH b AS (
  SELECT user_id, event_id, value,
    count(value) OVER w AS n,
    avg(value) OVER w AS mu,
    stddev_samp(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, value
FROM b
WHERE n >= 5 AND sd > 0 AND abs(value - mu) > 3.0 * sd
ORDER BY user_id, event_id""",
    "events_rolling_avg" ->
      """SELECT user_id, event_id,
round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_avg
FROM events ORDER BY user_id, event_id""",
    "events_funnel_conversion" ->
      """WITH c AS (
  SELECT count(DISTINCT user_id) AS click_users FROM events
  WHERE event_type = 'click'
), v AS (
  SELECT count(DISTINCT e.user_id) AS converted_users FROM events e
  WHERE e.event_type = 'click' AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
      AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '30 minutes')
)
SELECT click_users, converted_users,
  round(CAST(converted_users AS DOUBLE) / click_users, 4)
    AS conversion_rate
FROM c, v""",
    "events_session_window" ->
      """WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
      OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END
      AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS sess_start,
  max(ts) + INTERVAL '30 minutes' AS sess_end,
  count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, sess_start""",
    "events_json_props" ->
      """SELECT event_type, count(*) AS n_events,
round(sum(value), 2) AS sum_value,
round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type""",
    "events_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS w_end,
event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""",
    "events_sessionize" ->
      """WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
      OR ts > lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END
      AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
  min(ts) AS sess_start, max(ts) AS sess_end,
  round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id""",
    "events_asof_nearest" ->
      """WITH b AS (
  SELECT c.event_id AS click_id, c.user_id, p.event_id AS pid,
    round(p.value, 2) AS pval, epoch_us(c.ts) - epoch_us(p.ts) AS gap
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts >= p.ts
), f AS (
  SELECT c.event_id AS click_id, c.user_id, p.event_id AS pid,
    round(p.value, 2) AS pval, epoch_us(p.ts) - epoch_us(c.ts) AS gap
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT coalesce(b.click_id, f.click_id) AS click_id,
  coalesce(b.user_id, f.user_id) AS user_id,
  CASE WHEN f.gap IS NULL OR (b.gap IS NOT NULL AND b.gap <= f.gap)
    THEN b.pid ELSE f.pid END AS purchase_id,
  CASE WHEN f.gap IS NULL OR (b.gap IS NOT NULL AND b.gap <= f.gap)
    THEN b.pval ELSE f.pval END AS purchase_value,
  CASE WHEN f.gap IS NULL OR (b.gap IS NOT NULL AND b.gap <= f.gap)
    THEN b.gap ELSE f.gap END AS gap_us,
  CASE WHEN f.gap IS NULL OR (b.gap IS NOT NULL AND b.gap <= f.gap)
    THEN 'backward' ELSE 'forward' END AS direction
FROM b FULL JOIN f ON b.click_id = f.click_id
ORDER BY click_id""",
    "events_asof_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
p.event_id AS purchase_id, round(p.value, 2) AS purchase_value,
epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY click_id""",
    "events_decayed_value" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT user_id,
  round(sum(value * exp(-(epoch_us(m) - epoch_us(ts)) / (7.0 * 86400e6))), 6)
    AS decayed_value,
  count(*) AS n_events
FROM events, mx GROUP BY user_id ORDER BY user_id""",
    "events_pattern_funnel" ->
      """SELECT v.event_id AS view_id, v.user_id,
c.event_id AS click_id, p.event_id AS purchase_id,
epoch_us(p.ts) - epoch_us(v.ts) AS span_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id AND v.ts <= c.ts
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
WHERE epoch_us(p.ts) - epoch_us(v.ts) <= 172800000000
ORDER BY view_id""",
    "events_markov_transitions" ->
      """WITH s AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_type
  FROM events
), g AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
  round(CAST(n AS DOUBLE) /
    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
FROM g ORDER BY from_type, to_type""",
    "events_funnel_latency" ->
      """WITH f AS (
  SELECT epoch_us(p.ts) - epoch_us(v.ts) AS span_us
  FROM (SELECT * FROM events WHERE event_type = 'view') v
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON v.user_id = c.user_id AND v.ts <= c.ts
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts <= p.ts
  WHERE epoch_us(p.ts) - epoch_us(v.ts) <= 172800000000
)
SELECT CAST(count(*) AS BIGINT) AS n_funnels,
  round(quantile_cont(span_us, 0.5), 4) AS p50_us,
  round(quantile_cont(span_us, 0.9), 4) AS p90_us,
  round(quantile_cont(span_us, 0.99), 4) AS p99_us
FROM f""",
    // AFTER MATCH SKIP PAST LAST ROW as a recursive CTE: one recursion
    // round per MATCH (not per event) — each round extends every
    // user's automaton by one complete view->click->purchase match via
    // three LATERAL earliest-next lookups past the previous match's
    // last consumed position (ties broken by event_id, mirroring the
    // Spark per-key (ts, id) scan order)
    "events_pattern_greedy" ->
      """WITH RECURSIVE ord AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pos
  FROM events
),
m AS (
  SELECT user_id, CAST(0 AS BIGINT) AS match_no,
         CAST(0 AS BIGINT) AS boundary,
         CAST(NULL AS BIGINT) AS view_id, CAST(NULL AS BIGINT) AS click_id,
         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS BIGINT) AS span_us
  FROM (SELECT DISTINCT user_id FROM ord)
  UNION ALL
  SELECT m.user_id, m.match_no + 1, p.pos,
         v.event_id, c.event_id, p.event_id, p.ts_us - v.ts_us
  FROM m,
  LATERAL (SELECT pos, event_id, ts_us FROM ord o
           WHERE o.user_id = m.user_id AND o.pos > m.boundary
             AND o.event_type = 'view' ORDER BY pos LIMIT 1) v,
  LATERAL (SELECT pos, event_id FROM ord o
           WHERE o.user_id = m.user_id AND o.pos > v.pos
             AND o.event_type = 'click' ORDER BY pos LIMIT 1) c,
  LATERAL (SELECT pos, event_id, ts_us FROM ord o
           WHERE o.user_id = m.user_id AND o.pos > c.pos
             AND o.event_type = 'purchase' ORDER BY pos LIMIT 1) p
)
SELECT user_id, match_no, view_id, click_id, purchase_id, span_us
FROM m WHERE match_no >= 1
ORDER BY user_id, match_no""",
    "events_asof_forward" ->
      """SELECT c.event_id AS click_id, c.user_id,
p.event_id AS purchase_id, round(p.value, 2) AS purchase_value,
epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY click_id""",
    "events_asof_tolerance" ->
      """SELECT * FROM (
  SELECT c.event_id AS click_id, c.user_id,
    p.event_id AS purchase_id, round(p.value, 2) AS purchase_value,
    epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts >= p.ts
)
WHERE gap_us <= 3600000000
ORDER BY click_id""",
    "events_interval_join" ->
      """SELECT c.event_id AS click_id, count(*) AS n_purchases,
round(sum(p.value), 2) AS sum_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
  AND p.ts >= c.ts - INTERVAL '30 minutes' AND p.ts <= c.ts
GROUP BY c.event_id ORDER BY click_id""")
}
