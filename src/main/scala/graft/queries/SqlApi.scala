package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The SQL-text front end: the same engine driven through `spark.sql`
  * over temp views instead of the DataFrame API. These queries earn
  * their keep by exercising planner paths the DataFrame registry
  * doesn't: correlated EXISTS (subquery decorrelation to a semi join),
  * scalar subqueries, and CTE reuse. The query text doubles as its own
  * DuckDB oracle (kept ANSI-only).
  */
object SqlApi {

  private def view(spark: SparkSession, dir: String, name: String): Unit =
    Tables(spark, dir, name).createOrReplaceTempView(name)

  private val existsSql =
    """SELECT c_mktsegment, count(*) AS n_big_spenders
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Correlated EXISTS — Catalyst decorrelates to a left-semi join. */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "customer")
    view(spark, dir, "orders")
    spark.sql(existsSql)
  }

  private val scalarSql =
    """WITH stats AS (SELECT avg(o_totalprice) AS avg_price FROM orders)
SELECT o_orderpriority,
  count(*) AS n_above,
  round(min(o_totalprice) - (SELECT avg_price FROM stats), 2) AS min_gap
FROM orders
WHERE o_totalprice > (SELECT avg_price FROM stats)
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Scalar subquery + CTE: one computed constant reused twice. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(scalarSql)
  }

  private val notInSql =
    """SELECT n_name
FROM nation
WHERE n_nationkey NOT IN (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal < -900)
ORDER BY n_name"""

  /** NOT IN (null-aware anti join). */
  def notInSubquery(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "nation")
    view(spark, dir, "customer")
    spark.sql(notInSql)
  }

  private val lateralSparkSql =
    """SELECT w.word, count(*) AS n_docs
FROM documents LATERAL VIEW explode(
  array_distinct(filter(split(lower(regexp_replace(text, '[^a-zA-Z ]', ' ')),
    ' +'), t -> t != ''))) w AS word
WHERE length(w.word) >= 6
GROUP BY w.word ORDER BY w.word"""

  private val lateralDuckSql =
    raw"""SELECT w.word, count(*) AS n_docs
FROM documents,
  (SELECT unnest(list_distinct(list_filter(
    string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')),
    '\s+'), t -> t <> ''))) ) w(word)
WHERE length(w.word) >= 6
GROUP BY w.word ORDER BY w.word"""

  /** LATERAL VIEW explode — the SQL spelling of the generator path
    * (document frequency of long words). Oracle is DuckDB's lateral
    * UNNEST equivalent.
    */
  def lateralExplode(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "documents")
    spark.sql(lateralSparkSql)
  }

  private val windowSql =
    """SELECT o_orderkey, o_orderpriority,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
    AS n_in_priority,
  lead(o_orderkey) OVER w AS next_key
FROM orders WHERE o_orderkey % 100 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
ORDER BY o_orderpriority, o_orderkey"""

  /** Named WINDOW clause through the SQL front end (count/rank-based
    * frames only — deterministic across engines).
    */
  def windowClause(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(windowSql)
  }

  private val groupByAllSql =
    """SELECT l_returnflag, l_linestatus,
  count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus"""

  /** GROUP BY ALL (grouping keys inferred from the select list) —
    * supported by both engines with identical semantics.
    */
  def groupByAll(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql(groupByAllSql)
  }

  private val pivotSparkSql =
    """SELECT * FROM (
  SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer)
PIVOT (round(sum(c_acctbal), 2)
  FOR c_mktsegment IN ('AUTOMOBILE' AS auto, 'BUILDING' AS building,
    'FURNITURE' AS furniture, 'HOUSEHOLD' AS household,
    'MACHINERY' AS machinery))
ORDER BY c_nationkey"""

  private val pivotDuckSql =
    """SELECT c_nationkey,
  round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'AUTOMOBILE'), 2) AS auto,
  round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'BUILDING'), 2) AS building,
  round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'FURNITURE'), 2) AS furniture,
  round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'HOUSEHOLD'), 2) AS household,
  round(sum(c_acctbal) FILTER (WHERE c_mktsegment = 'MACHINERY'), 2) AS machinery
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** SQL PIVOT syntax (wide aggregation). Oracle is the dialect-safe
    * FILTERed-aggregate spelling — identical result, and incidentally
    * the plan PIVOT compiles to anyway (one hash agg, no extra
    * shuffle beyond the groupBy).
    */
  def pivotSql(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "customer")
    spark.sql(pivotSparkSql)
  }

  private val distributeSortSparkSql =
    """SELECT l_suppkey, l_orderkey, l_quantity FROM lineitem
WHERE l_orderkey % 500 = 0
DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey, l_linenumber"""

  private val distributeSortDuckSql =
    """SELECT l_suppkey, l_orderkey, l_quantity FROM lineitem
WHERE l_orderkey % 500 = 0"""

  /** DISTRIBUTE BY / SORT BY — Hive-style physical-layout control
    * through the SQL front end (hash repartition + per-partition
    * sort, NO global sort stage; this is the SQL spelling of the
    * write-side clustering every large sink wants). Content is
    * row-set-identical to the plain projection, which is the oracle
    * (the driver compare is order-insensitive).
    */
  def distributeSort(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql(distributeSortSparkSql)
  }

  private val recursiveCteSql =
    """WITH RECURSIVE cal(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM cal WHERE d < DATE '1995-02-15'
)
SELECT cal.d, count(o_orderkey) AS n_orders
FROM cal LEFT JOIN orders ON CAST(o_orderdate AS DATE) = cal.d
GROUP BY cal.d ORDER BY cal.d"""

  /** WITH RECURSIVE (Spark 4 recursive CTE): a generated calendar
    * spine left-joined to facts so zero-activity days surface — the
    * canonical gap-filling shape reporting pipelines need.
    */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(recursiveCteSql)
  }

  private val lateralSubquerySql =
    """SELECT n.n_name, l.c_name, l.bal
FROM nation n, LATERAL (
  SELECT c_name, round(c_acctbal, 2) AS bal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 1) l
ORDER BY n.n_name"""

  /** Correlated LATERAL subquery (top-1-per-group spelled as a join,
    * decorrelated by the planner) — distinct from LATERAL VIEW, which
    * is generator syntax.
    */
  def lateralSubquery(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "nation")
    view(spark, dir, "customer")
    spark.sql(lateralSubquerySql)
  }

  /** The native graftx expressions as SQL scalar functions
    * (GraftFunctions.register / GraftExtensions injection): a SQL user
    * computes codegen'd dot products and shingle jaccards without the
    * DataFrame API. Hash-based shingles are engine-internal but the
    * JACCARD VALUE equals the string-trigram set jaccard, so the whole
    * query oracle-checks.
    */
  def nativeFuncs(spark: SparkSession, dir: String): DataFrame = {
    org.apache.spark.sql.graftx.GraftFunctions.register(spark)
    Tables(spark, dir, "documents").createOrReplaceTempView("docs_nf")
    Tables(spark, dir, "embeddings").createOrReplaceTempView("emb_nf")
    spark.sql("""
      SELECT a.doc_id AS ida, b.doc_id AS idb,
        round(dot_product(ea.embedding, eb.embedding), 6) AS dot,
        round(jaccard_sorted(text_shingles(a.text),
          text_shingles(b.text)), 6) AS jac,
        round(jaro_winkler(substring(a.text, 1, 40),
          substring(b.text, 1, 40)), 6) AS jw
      FROM docs_nf a JOIN docs_nf b ON b.doc_id = a.doc_id + 1
      JOIN emb_nf ea ON ea.vec_id = a.doc_id
      JOIN emb_nf eb ON eb.vec_id = b.doc_id
      WHERE a.doc_id % 10 = 0
      ORDER BY ida""")
  }

  /** Parameterized SQL (Spark 4 named-parameter binding): the text is a
    * constant template, values bind server-side — the
    * injection-safe/plan-cacheable form a SQL front end should use.
    */
  /** Spark 4 SQL pipe syntax (|> operators — the linear dataflow
    * spelling of SELECT): scan -> filter -> join -> aggregate ->
    * order, each stage textually in execution order. Catalyst plans it
    * identically to the nested form, so the DuckDB oracle is the plain
    * ANSI equivalent — pinning that the pipe FRONT END changes nothing
    * semantically.
    */
  def pipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    view(spark, dir, "customer")
    spark.sql(
      """FROM orders
         |> WHERE o_orderstatus = 'F'
         |> JOIN customer ON o_custkey = c_custkey
         |> AGGREGATE count(*) AS n_orders,
              round(sum(o_totalprice), 2) AS revenue
            GROUP BY c_mktsegment
         |> SELECT c_mktsegment AS segment, n_orders, revenue
         |> ORDER BY segment""")
  }

  /** IDENTIFIER clause (Spark 3.5+): table and column names bound from
    * parameters as IDENTIFIERS, not strings — templated DDL/queries
    * without injection (the safe spelling of dynamic SQL that
    * EXECUTE IMMEDIATE string-splicing cannot give). The oracle is the
    * statically-spelled equivalent: binding must be identity.
    */
  def identifierClause(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql(
      """SELECT l_returnflag, count(*) AS n,
           round(sum(IDENTIFIER(:measure)), 2) AS total
         FROM IDENTIFIER(:tbl)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
      Map("tbl" -> "lineitem", "measure" -> "l_extendedprice"))
  }

  def parameterized(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_p")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
         FROM orders_p
         WHERE o_totalprice > :minPrice AND o_orderpriority = :prio
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
      Map("minPrice" -> 50000, "prio" -> "1-URGENT"))
  }

  /** SQL UNPIVOT syntax — wide per-status metrics melted back to long
    * form in the FROM clause (the SQL spelling of the DataFrame
    * `unpivot_metrics` melt; planned as a Generate, no shuffle beyond
    * the feeding aggregation).
    */
  def unpivotSql(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(
      """SELECT o_orderstatus, metric, val FROM (
           SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price,
             round(avg(o_totalprice), 4) AS avg_price
           FROM orders GROUP BY o_orderstatus
         ) UNPIVOT (val FOR metric IN (n_orders, total_price, avg_price))
         ORDER BY o_orderstatus, metric""")
  }

  /** EXECUTE IMMEDIATE (Spark 4): SQL text composed as a value and run
    * with positional USING binds — the dynamic-SQL escape hatch,
    * injection-safe because the argument travels as a bind, not by
    * string splicing.
    */
  def executeImmediate(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(
      """EXECUTE IMMEDIATE
           'SELECT o_orderpriority, count(*) AS n,
              round(max(o_totalprice), 2) AS max_price
            FROM orders WHERE o_totalprice > ?
            GROUP BY o_orderpriority ORDER BY o_orderpriority'
         USING 400000""")
  }

  private val filteredAggSql =
    """SELECT o_orderpriority,
  count(*) AS n_all,
  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2)
    AS rev_finished,
  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
    AS avg_open
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** FILTER (WHERE ...) aggregate modifiers — per-aggregate predicates
    * in ONE hash aggregation pass (the declarative form of "N metrics,
    * N ad-hoc WHERE clauses" that otherwise becomes N scans). ANSI
    * syntax shared verbatim with the oracle.
    */
  def filteredAgg(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql(filteredAggSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_filtered_agg" -> filteredAgg,
    "sql_unpivot" -> unpivotSql,
    "sql_execute_immediate" -> executeImmediate,
    "sql_parameterized" -> parameterized,
    "sql_pipe_syntax" -> pipeSyntax,
    "sql_identifier_clause" -> identifierClause,
    "sql_native_funcs" -> nativeFuncs,
    "sql_recursive_cte" -> recursiveCte,
    "sql_lateral_subquery" -> lateralSubquery,
    "sql_pivot" -> pivotSql,
    "sql_distribute_sort" -> distributeSort,
    "sql_group_by_all" -> groupByAll,
    "sql_exists_subquery" -> existsSubquery,
    "sql_scalar_subquery" -> scalarSubquery,
    "sql_notin_subquery" -> notInSubquery,
    "sql_lateral_explode" -> lateralExplode,
    "sql_window_clause" -> windowClause)

  val oracle: Map[String, String] = Map(
    "sql_filtered_agg" -> filteredAggSql,
    "sql_unpivot" ->
      """WITH wide AS (
  SELECT o_orderstatus,
    CAST(count(*) AS DOUBLE) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price,
    round(avg(o_totalprice), 4) AS avg_price
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM wide
UNION ALL
SELECT o_orderstatus, 'total_price', total_price FROM wide
UNION ALL
SELECT o_orderstatus, 'avg_price', avg_price FROM wide
ORDER BY o_orderstatus, metric""",
    "sql_execute_immediate" ->
      """SELECT o_orderpriority, count(*) AS n,
round(max(o_totalprice), 2) AS max_price
FROM orders WHERE o_totalprice > 400000
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "sql_identifier_clause" ->
      """SELECT l_returnflag, count(*) AS n,
  round(sum(l_extendedprice), 2) AS total
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "sql_pipe_syntax" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_orders,
  round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY c_mktsegment ORDER BY segment""",
    "sql_parameterized" ->
      """SELECT o_orderstatus, count(*) AS n,
round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_totalprice > 50000 AND o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sql_native_funcs" ->
      raw"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(
    regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'),
    w -> w <> '') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM toks WHERE len(ws) >= 3
)
SELECT a.doc_id AS ida, b.doc_id AS idb,
  round(list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dot,
  round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
    (CAST(len(x.shs) AS DOUBLE) + CAST(len(y.shs) AS DOUBLE)
      - CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)), 6) AS jac,
  round(jaro_winkler_similarity(substring(a.text, 1, 40),
    substring(b.text, 1, 40)), 6) AS jw
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
JOIN embeddings ea ON ea.vec_id = a.doc_id
JOIN embeddings eb ON eb.vec_id = b.doc_id
JOIN sh x ON x.doc_id = a.doc_id
JOIN sh y ON y.doc_id = b.doc_id
WHERE a.doc_id % 10 = 0
ORDER BY ida""",
    "sql_exists_subquery" -> existsSql,
    "sql_scalar_subquery" -> scalarSql,
    "sql_notin_subquery" -> notInSql,
    "sql_lateral_explode" -> lateralDuckSql,
    "sql_window_clause" -> windowSql,
    "sql_group_by_all" -> groupByAllSql,
    "sql_pivot" -> pivotDuckSql,
    "sql_distribute_sort" -> distributeSortDuckSql,
    "sql_recursive_cte" -> recursiveCteSql,
    "sql_lateral_subquery" -> lateralSubquerySql)
}
