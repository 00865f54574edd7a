package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

import graft.Tables
import graft.streaming.EventStreams
import graft.text.{Stopwords, TextOps}

/** Second relational/text coverage wave: statistical + approximate
  * aggregates, cube/grouping sets, map functions, date arithmetic,
  * analytic window functions, collect_set, cross join, union-by-name,
  * sliding windows (the batch twin of the streaming job), and TF-IDF.
  */
object Coverage {

  /** Statistical aggregates per segment. */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
        round(var_samp(col("c_acctbal")), 4).as("var_bal"),
        round(percentile(col("c_acctbal"), lit(0.5)), 4).as("median_bal"),
        round(min("c_acctbal"), 2).as("min_bal"),
        round(max("c_acctbal"), 2).as("max_bal"))
      .orderBy("c_mktsegment")

  /** CUBE with subtotal markers. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"))
      .orderBy("status", "priority")

  /** Explicit GROUPING SETS ((status), (priority)). */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")

  /** IGNORE NULLS window navigation: lag/lead skip over null gaps and
    * first/last track the running non-null frontier — the sparse-
    * sensor / sparse-field carry-forward pattern (fill a reading from
    * the most recent non-null observation). Same single window sort as
    * the plain forms; the null-skipping happens inside the frame scan.
    */
  def windowIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def v = expr("nullif(cast(floor(value) as bigint) % 3, 0)")
    Tables(spark, dir, "events").select(
      col("event_id"), col("user_id"), v.as("v"),
      lag(v, 1, null, ignoreNulls = true).over(w).as("prev_nn"),
      lead(v, 1, null, ignoreNulls = true).over(w).as("next_nn"),
      first(v, ignoreNulls = true).over(w).as("first_nn"),
      last(v, ignoreNulls = true).over(w).as("last_nn"))
      .orderBy("event_id")
  }

  /** Map functions over parsed JSON props. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, LongType))
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        element_at(map_keys(m), 1).as("first_key"),
        element_at(m, "k").as("k_val"),
        size(m).cast("long").as("n_entries"),
        element_at(map_values(m), 1).as("first_val"))
  }

  /** Date arithmetic: add_months, date_add, last_day, datediff,
    * day-of-week, make_date.
    */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        date_add(col("o_orderdate"), 30).as("plus30d"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), make_date(lit(2020), lit(1), lit(1)))
          .cast("long").as("days_since_2020"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))

  /** Analytic window functions: lead, first/last value, ntile,
    * percent_rank, cume_dist.
    */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        first("o_totalprice").over(wFull).as("first_price"),
        last("o_totalprice").over(wFull).as("last_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
  }

  /** collect_set flattened to a deterministic string (array payloads
    * hash differently across engines; the string form is parity-safe).
    */
  def collectNations(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(
        concat_ws(",", array_sort(collect_set(col("n_name")))).as("nations"),
        countDistinct(col("n_name")).as("n_nations"))
      .orderBy("r_name")
  }

  /** Approximate distinct (HLL) vs exact — rows-only (HLL sketches are
    * engine-specific); CoverageSpec asserts the error bound.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .orderBy("l_returnflag")

  /** Cross join (tiny dims only — the grid shape, not a data blowup). */
  def crossGrid(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region").select("r_name")
    val seg = Tables(spark, dir, "customer").select("c_mktsegment").distinct()
    r.crossJoin(seg).orderBy("r_name", "c_mktsegment")
  }

  /** unionByName across differently-shaped account tables. */
  def unionAccounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select(
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      lit("customer").as("side"))
    val s = Tables(spark, dir, "supplier").select(
      lit("supplier").as("side"), col("s_name").as("name"),
      col("s_acctbal").as("acctbal"))
    c.unionByName(s)
      .orderBy(col("acctbal").desc, col("name"))
      .limit(20)
  }

  /** posexplode with ordinals (DuckDB zips parallel unnests). */
  def arrayPosexplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")))
      .select(col("p_partkey"), col("pos").cast("long").as("pos"),
        col("col").as("word"))

  /** Array scalar functions on the name tokens. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val arr = split(col("p_name"), " ")
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        size(arr).cast("long").as("n_words"),
        array_contains(arr, "small").as("has_small"),
        concat_ws(",", array_sort(arr)).as("sorted_words"),
        element_at(arr, 1).as("first_word"),
        concat_ws(",", slice(arr, 1, 2)).as("first_two"),
        concat_ws(",", reverse(arr)).as("reversed"))
  }

  /** Pivot: status columns per priority (missing combos filled 0 to
    * match the oracle's FILTER counts).
    */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0)
      .orderBy("o_orderpriority")

  /** Sliding windows, batch twin of EventStreams.slidingCounts. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables(spark, dir, "events"))
      .orderBy("w_start", "event_type")

  /** TF-IDF top-3 terms per document (first 50 docs): two aggregations
    * + a join of the document-frequency table (broadcast ONLY under
    * the size-estimate budget — noisy web text at 100 TB can grow the
    * vocabulary past executor memory; the fallback is the shuffled
    * equi-join on the word key), window top-k.
    */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // corpus size as a COMPUTED one-row broadcast, not a driver-side
    // collect — at scale the count is a job like any other and rides
    // the same DAG instead of serializing on the driver
    val nd = docs.agg(count(lit(1)).cast("double").as("_nd"))
    // ONE tokenize pass (r15): words reads the family-wide token memo,
    // and the document-frequency table derives FROM the tf table —
    // df(word) == countDistinct(doc_id) == the number of tf rows for
    // the word, since tf is one row per (doc_id, word) by construction.
    // The second full tokenize+explode+shuffle of every token instance
    // is gone; the df aggregation reads |distinct (doc, word)| rows,
    // and both consumers of tf reuse one exchange.
    val words = TextQueries.tokenized(spark, dir).select(
      col("doc_id"),
      explode(col("ws")).as("word"))
      .where(!col("word").isin(Stopwords.english: _*))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val dfSide =
      if (graft.operators.Dedup.broadcastFits(df)) broadcast(df) else df
    val scored = tf.join(dfSide, "word").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("word"),
        org.apache.spark.sql.graftx.RoundAwayFromZero.column(
          col("tf") * (log((col("_nd") + 1.0) /
            (col("df") + 1.0)) + 1.0), 6).as("tfidf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word"))
    scored
      .where(col("doc_id") < 50)
      .select(col("doc_id"), col("word"), col("tfidf"),
        row_number().over(w).cast("long").as("rank"))
      .where(col("rank") <= 3)
      .orderBy("doc_id", "rank")
  }

  /** Typed Dataset API: groupByKey + mapGroups with per-group
    * imperative logic (longest inter-event gap per user) — the shape
    * for genuinely sequential per-key computations the window
    * functions can't express. The group materializes in memory, so
    * this is for keys with BOUNDED event counts (users, sessions);
    * unbounded keys belong in flatMapGroupsWithState where the state
    * is explicit. Gap in epoch-millis: integer math, exact in both
    * engines.
    */
  def typedUserGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
    evs.groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val arr = it.toArray.sortBy(e => (e._2.getTime, e._3))
        var maxGap = 0L
        var i = 1
        while (i < arr.length) {
          maxGap = math.max(maxGap, arr(i)._2.getTime - arr(i - 1)._2.getTime)
          i += 1
        }
        (uid, arr.length.toLong, maxGap)
      }
      .toDF("user_id", "n_events", "max_gap_ms")
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_ignore_nulls" -> windowIgnoreNulls,
    "typed_user_gaps" -> typedUserGaps,
    "agg_stats" -> aggStats,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_approx_distinct" -> approxDistinct,
    "agg_pivot_status" -> aggPivot,
    "array_posexplode" -> arrayPosexplode,
    "array_funcs" -> arrayFuncs,
    "map_funcs" -> mapFuncs,
    "date_arith" -> dateArith,
    "window_analytics" -> windowAnalytics,
    "agg_collect_nations" -> collectNations,
    "join_cross_grid" -> crossGrid,
    "setop_union_accounts" -> unionAccounts,
    "events_sliding_window" -> slidingWindow,
    "text_tfidf_top" -> tfidfTop)

  private val stopSql = Stopwords.sqlInList(Stopwords.english)

  val oracle: Map[String, String] = Map(
    // DuckDB has no IGNORE NULLS syntax; aggregate-as-window with a
    // FILTER clause over the right frame is the exact equivalent
    // (arg_max on the row number = latest non-null, arg_min = earliest)
    "window_ignore_nulls" ->
      """WITH t AS (
  SELECT event_id, user_id,
    nullif(CAST(floor(value) AS BIGINT) % 3, 0) AS v,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id, v,
  arg_max(v, rn) FILTER (v IS NOT NULL) OVER (
    PARTITION BY user_id ORDER BY rn
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nn,
  arg_min(v, rn) FILTER (v IS NOT NULL) OVER (
    PARTITION BY user_id ORDER BY rn
    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_nn,
  arg_min(v, rn) FILTER (v IS NOT NULL) OVER (
    PARTITION BY user_id ORDER BY rn) AS first_nn,
  arg_max(v, rn) FILTER (v IS NOT NULL) OVER (
    PARTITION BY user_id ORDER BY rn) AS last_nn
FROM t ORDER BY event_id""",
    "typed_user_gaps" ->
      """WITH g AS (
  SELECT user_id,
    epoch_ms(ts) - epoch_ms(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_events,
  coalesce(max(gap), 0) AS max_gap_ms
FROM g GROUP BY user_id ORDER BY user_id""",
    "agg_stats" ->
      """SELECT c_mktsegment, count(*) AS n,
count(DISTINCT c_nationkey) AS n_nations,
round(stddev_samp(c_acctbal), 4) AS sd_bal,
round(var_samp(c_acctbal), 4) AS var_bal,
round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority""",
    "agg_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n_orders,
round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY status, priority""",
    "agg_pivot_status" ->
      """SELECT o_orderpriority,
count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "array_posexplode" ->
      """WITH p AS (SELECT p_partkey, string_split(p_name, ' ') AS parts
  FROM part)
SELECT p_partkey, unnest(range(0, len(parts))) AS pos,
unnest(parts) AS word FROM p""",
    "array_funcs" ->
      """WITH p AS (SELECT p_partkey, string_split(p_name, ' ') AS parts
  FROM part)
SELECT p_partkey, CAST(len(parts) AS BIGINT) AS n_words,
list_contains(parts, 'small') AS has_small,
array_to_string(list_sort(parts), ',') AS sorted_words,
parts[1] AS first_word,
array_to_string(parts[1:2], ',') AS first_two,
array_to_string(list_reverse(parts), ',') AS reversed
FROM p""",
    "map_funcs" ->
      """SELECT event_id, 'k' AS first_key,
CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
CAST(1 AS BIGINT) AS n_entries,
CAST(json_extract_string(props, '$.k') AS BIGINT) AS first_val
FROM events""",
    "date_arith" ->
      """SELECT o_orderkey,
CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30d,
last_day(CAST(o_orderdate AS DATE)) AS month_end,
date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS days_since_2020,
CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
FROM orders""",
    "window_analytics" ->
      """SELECT o_custkey, o_orderkey,
lead(o_totalprice, 1) OVER w AS next_price,
first_value(o_totalprice) OVER wf AS first_price,
last_value(o_totalprice) OVER wf AS last_price,
CAST(ntile(4) OVER w AS BIGINT) AS quartile,
percent_rank() OVER w AS pct_rank,
cume_dist() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "agg_collect_nations" ->
      """SELECT r_name,
array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
count(DISTINCT n_name) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name""",
    "join_cross_grid" ->
      """SELECT r_name, c_mktsegment FROM region
CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
ORDER BY r_name, c_mktsegment""",
    "setop_union_accounts" ->
      """SELECT name, acctbal, side FROM (
  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS side
  FROM customer
  UNION ALL
  SELECT s_name, s_acctbal, 'supplier' FROM supplier)
ORDER BY acctbal DESC, name LIMIT 20""",
    "events_sliding_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts)
  - k * INTERVAL '5 minutes' AS w_start,
time_bucket(INTERVAL '5 minutes', ts) + (2 - k) * INTERVAL '5 minutes'
  AS w_end,
event_type, count(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) AS s(k)
GROUP BY 1, 2, 3 ORDER BY w_start, event_type""",
    "text_tfidf_top" ->
      raw"""WITH words AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(regexp_replace(text,
      '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '')) AS word
  FROM documents
), filt AS (SELECT doc_id, word FROM words WHERE word NOT IN $stopSql),
tf AS (SELECT doc_id, word, count(*) AS tf FROM filt GROUP BY doc_id, word),
idf AS (SELECT word, count(DISTINCT doc_id) AS df FROM filt GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word,
    round(tf * (ln((n.n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN idf USING (word) CROSS JOIN n
), ranked AS (
  SELECT doc_id, word, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word)
      AS rank
  FROM scored WHERE doc_id < 50
)
SELECT doc_id, word, tfidf, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank""")
}
