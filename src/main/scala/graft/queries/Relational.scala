package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator coverage on the star schema (SURVEY.md §2.2):
  * aggregation, joins (inner/broadcast/semi/anti/range), windows, sorts,
  * set ops, distinct, string/date/math scalar functions, rollup, CASE.
  *
  * Scale posture: dimension joins are explicitly broadcast (region,
  * nation, part fit on every executor at any SF); fact-fact joins are
  * equi-joins on the shuffle key; every aggregate is a partial+final
  * hash agg; sorts happen only on already-aggregated (small) results
  * except where the query semantics require a global top-k, which Spark
  * executes as TakeOrdered (no full sort at scale).
  */
object Relational {

  // --- queries ---------------------------------------------------------

  /** TPC-H Q1-style pricing summary: the canonical partial+final agg. */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Star join: orders -> customer (shuffle equi) -> nation -> region
    * (broadcast dims). Catalyst picks BHJ for the dims; the only real
    * shuffle is orders⋈customer on the key.
    */
  def joinStarRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** Fact ⋈ broadcast dim: lineitem ⋈ part, revenue per brand. */
  def joinBroadcastPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Left-semi: customers having at least one open order. */
  def joinSemiSegment(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .where(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti: customers with no high-value (>400k) order, by nation.
    * The reference's exists-check incrementality (SURVEY.md O3) done as
    * one distributed anti-join instead of N remote lookups.
    */
  def joinAntiIdle(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")
  }

  /** Equi-join + range predicate: ship delay within 60 days of order
    * date, average delay per priority.
    */
  def joinRangeShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4)
          .as("avg_delay_days"))
      .orderBy("o_orderpriority")
  }

  /** Ranking window: top 3 orders per customer by price. */
  def windowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Cumulative window + lag: running revenue per customer over time. */
  def windowRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      round(sum("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .as("running_total"),
      round(coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 2)
        .as("prev_price"))
  }

  /** Global top-k: executes as TakeOrdered, no full sort. */
  def sortTopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Set ops: which nations have customers vs suppliers. */
  def setopNations(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("side", lit("both"))
      .unionByName(cn.except(sn).withColumn("side", lit("customer_only")))
      .unionByName(sn.except(cn).withColumn("side", lit("supplier_only")))
      .orderBy("side", "nationkey")
  }

  /** Distinct / dropDuplicates. */
  def distinctBrands(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select("p_brand", "p_type")
      .dropDuplicates()
      .orderBy("p_brand", "p_type")

  /** String scalar functions (all codegen'd built-ins). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"),
        trim(col("p_name")).as("name_trim"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        reverse(col("p_brand")).as("brand_rev"))

  /** Date/time scalar functions + monthly rollup. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        min(date_trunc("month", col("o_orderdate"))).as("month_start"))
      .orderBy("y", "m")

  /** Math scalar functions, row-level. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * col("l_discount")).as("disc_amt"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        abs(col("l_extendedprice") - col("l_quantity") * lit(100.0))
          .as("abs_diff"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_discount"), 2).as("disc_sq"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"))

  /** Rollup with subtotal rows (grouping-set nulls coalesced to 'ALL'
    * so both engines agree on the marker).
    */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")

  /** CASE-based bucketing. */
  def caseBucketing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        when(col("o_totalprice") < 1000, "small")
          .when(col("o_totalprice") < 10000, "mid")
          .otherwise("large").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("bucket")

  // --- registry --------------------------------------------------------

  /** TPC-H Q5 shape: local-supplier revenue per nation for one region
    * and year — the 6-table join with the c_nationkey = s_nationkey
    * locality condition. Dims broadcast; the fact-side joins shuffle on
    * their natural keys.
    */
  def joinLocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(r("r_name") === "ASIA" &&
        o("o_orderdate") >= lit("1996-01-01") &&
        o("o_orderdate") < lit("1997-01-01"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 shape: top customers by returned-item revenue in one
    * quarter — fact filter pushes to the scan, dims broadcast, top-k
    * via TakeOrdered (no global sort materialization).
    */
  def joinTopReturns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.where(col("l_returnflag") === "R")
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .where(o("o_orderdate") >= lit("1996-01-01") &&
        o("o_orderdate") < lit("1996-07-01"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Salted skew join, oracle-pinned: the salt must be invisible in
    * the result (same rows as the plain join). 8-way salting splits a
    * hot orderkey across 8 reducers; the right side replicates once
    * per salt (dim-sized × salts, bounded).
    */
  def joinSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .where(pmod(col("l_orderkey"), lit(3)) === 0)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables(spark, dir, "orders")
      .where(pmod(col("o_orderkey"), lit(3)) === 0)
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    graft.operators.SkewJoin.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy("o_orderstatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** TPC-H Q18 shape: large-quantity orders — a HAVING-filtered agg
    * over the fact drives a semi-ish join back to orders + customer.
    */
  def joinLargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val big = li.groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .where(col("total_qty") > 150)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  /** TPC-H Q16 shape: distinct supplier count per part attribute via
    * the lineitem bridge — a two-key distinct aggregation.
    */
  def joinPartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    li.join(broadcast(p.where(col("p_size") <= 10)),
        li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted_skew" -> joinSaltedSkew,
    "join_large_orders" -> joinLargeOrders,
    "join_part_supplier_counts" -> joinPartSupplierCounts,
    "join_local_supplier" -> joinLocalSupplier,
    "join_top_returns" -> joinTopReturns,
    "agg_pricing_summary" -> aggPricingSummary,
    "join_star_revenue" -> joinStarRevenue,
    "join_broadcast_part" -> joinBroadcastPart,
    "join_semi_segment" -> joinSemiSegment,
    "join_anti_idle" -> joinAntiIdle,
    "join_range_shipdelay" -> joinRangeShipDelay,
    "window_top_orders" -> windowTopOrders,
    "window_running_total" -> windowRunningTotal,
    "sort_top_orders" -> sortTopOrders,
    "setop_nations" -> setopNations,
    "distinct_brands" -> distinctBrands,
    "string_funcs" -> stringFuncs,
    "date_funcs" -> dateFuncs,
    "math_funcs" -> mathFuncs,
    "rollup_orders" -> rollupOrders,
    "case_bucketing" -> caseBucketing)

  val oracle: Map[String, String] = Map(
    "join_salted_skew" ->
      """SELECT o_orderstatus, round(sum(l_quantity), 2) AS sum_qty,
round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey % 3 = 0
GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "join_large_orders" ->
      """WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
)
SELECT c_name, o_orderkey, o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 50""",
    "join_part_supplier_counts" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size""",
    "join_local_supplier" ->
      """SELECT n_name,
round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "join_top_returns" ->
      """SELECT c_custkey, c_name, n_name,
round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
round(sum(l_quantity), 2) AS sum_qty,
round(sum(l_extendedprice), 2) AS sum_base_price,
round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
round(avg(l_quantity), 4) AS avg_qty,
round(avg(l_extendedprice), 4) AS avg_price,
count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "join_star_revenue" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "join_broadcast_part" ->
      """SELECT p_brand,
round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand""",
    "join_semi_segment" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
WHERE EXISTS (SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_anti_idle" ->
      """SELECT c_nationkey, count(*) AS n_customers FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_nationkey ORDER BY c_nationkey""",
    "join_range_shipdelay" ->
      """SELECT o_orderpriority, count(*) AS n_items,
round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  AND l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
round(sum(o_totalprice) OVER (PARTITION BY o_custkey
  ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
round(COALESCE(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
  ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
FROM orders""",
    "sort_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "setop_nations" ->
      """SELECT nationkey, 'both' AS side FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier) t1
UNION ALL
SELECT nationkey, 'customer_only' AS side FROM
  (SELECT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier) t2
UNION ALL
SELECT nationkey, 'supplier_only' AS side FROM
  (SELECT s_nationkey AS nationkey FROM supplier
   EXCEPT SELECT c_nationkey FROM customer) t3
ORDER BY side, nationkey""",
    "distinct_brands" ->
      """SELECT DISTINCT p_brand, p_type FROM part
ORDER BY p_brand, p_type""",
    "string_funcs" ->
      raw"""SELECT p_partkey,
upper(p_name) AS name_upper,
CAST(length(p_name) AS BIGINT) AS name_len,
substring(p_name, 1, 10) AS name_prefix,
concat_ws('|', p_brand, p_type) AS brand_type,
COALESCE(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
trim(p_name) AS name_trim,
lpad(p_brand, 12, '*') AS brand_pad,
reverse(p_brand) AS brand_rev
FROM part""",
    "date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
CAST(month(o_orderdate) AS BIGINT) AS m,
count(*) AS n_orders,
min(o_orderdate) AS first_order,
max(o_orderdate) AS last_order,
CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS month_start
FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
l_extendedprice * l_discount AS disc_amt,
CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
abs(l_extendedprice - l_quantity * 100.0) AS abs_diff,
l_orderkey % 7 AS key_mod,
sqrt(l_quantity) AS qty_sqrt,
pow(l_discount, 2) AS disc_sq,
greatest(l_tax, l_discount) AS max_rate
FROM lineitem""",
    "rollup_orders" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
COALESCE(o_orderpriority, 'ALL') AS priority,
count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority""",
    "case_bucketing" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
  WHEN o_totalprice < 10000 THEN 'mid' ELSE 'large' END AS bucket,
count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue,
round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY 1 ORDER BY bucket""")
}
