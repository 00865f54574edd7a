package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Third scalar-function coverage wave: conditional/null-handling,
  * bitwise, cryptographic hash, timestamp parts, struct pack/unpack,
  * and deterministic systematic sampling. All oracle-checked; every
  * expression here is a codegen'd Catalyst built-in (minimal-UDF
  * policy, SURVEY.md §2.2 UDF row).
  */
object FuncsExtra {

  /** Conditional + null-handling scalars. TPC-H columns are non-null,
    * so nullif() manufactures the nulls the null-paths need.
    */
  def condFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"),
        nvl2(nullif(col("o_orderpriority"), lit("1-URGENT")),
          lit("relaxed"), lit("urgent")).as("urgency"),
        least(col("o_totalprice"), lit(150000.0)).as("price_capped"),
        greatest(col("o_custkey"), lit(100L)).as("cust_floor"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("band"))
      .orderBy("o_orderkey")

  /** Bitwise scalars over the integer keys. */
  def bitFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("and255"),
        col("l_orderkey").bitwiseOR(col("l_linenumber").cast("long")).as("or_ln"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xor_pk"),
        shiftleft(col("l_linenumber"), 4).cast("long").as("shl4"),
        shiftright(col("l_orderkey"), 2).as("shr2"),
        bit_count(col("l_orderkey")).cast("long").as("popcount"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Cryptographic digests (content-addressing for dedup/lineage). */
  def hashFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("md5_name"),
        sha2(col("c_name"), 256).as("sha256_name"))
      .orderBy("c_custkey")

  /** Timestamp part extraction + truncation on the event stream. */
  def tsFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("ts_hour"),
        date_trunc("day", col("ts")).as("ts_day"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("m"),
        dayofweek(col("ts")).cast("long").as("dow"),
        unix_micros(col("ts")).as("epoch_us"))
      .orderBy("event_id")

  /** Struct pack + field access (nested-type round trip in one plan). */
  def structFuncs(spark: SparkSession, dir: String): DataFrame = {
    val packed = Tables(spark, dir, "nation")
      .select(col("n_nationkey"),
        struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("s"))
    packed.select(
        col("n_nationkey"),
        col("s.name").as("s_name"),
        (col("s.rk") + 1).as("rk_next"),
        length(col("s.name")).cast("long").as("name_len"))
      .orderBy("n_nationkey")
  }

  /** Deterministic systematic sample: every 20th order key. The same
    * predicate runs in both engines (unlike TABLESAMPLE, whose RNG is
    * engine-specific — the seeded Bernoulli path is covered rows-only
    * in SamplingSpec).
    */
  def sampleSystematic(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .where(pmod(col("o_orderkey"), lit(20)) === 0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"),
        round(avg("o_totalprice"), 2).as("avg_price"))
      .orderBy("o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cond_funcs" -> condFuncs,
    "bit_funcs" -> bitFuncs,
    "hash_funcs" -> hashFuncs,
    "ts_funcs" -> tsFuncs,
    "struct_funcs" -> structFuncs,
    "sample_systematic" -> sampleSystematic)

  val oracle: Map[String, String] = Map(
    "cond_funcs" ->
      """SELECT o_orderkey,
coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NOT NULL
  THEN 'relaxed' ELSE 'urgent' END AS urgency,
least(o_totalprice, 150000.0) AS price_capped,
greatest(o_custkey, 100) AS cust_floor,
CASE WHEN o_totalprice > 200000 THEN 'high'
  WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS band
FROM orders ORDER BY o_orderkey""",
    "bit_funcs" ->
      """SELECT l_orderkey, l_linenumber,
l_orderkey & 255 AS and255,
l_orderkey | CAST(l_linenumber AS BIGINT) AS or_ln,
xor(l_orderkey, l_partkey) AS xor_pk,
CAST(l_linenumber << 4 AS BIGINT) AS shl4,
l_orderkey >> 2 AS shr2,
CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "hash_funcs" ->
      """SELECT c_custkey, md5(c_name) AS md5_name,
sha256(c_name) AS sha256_name
FROM customer ORDER BY c_custkey""",
    "ts_funcs" ->
      """SELECT event_id,
date_trunc('hour', ts) AS ts_hour,
date_trunc('day', ts) AS ts_day,
CAST(hour(ts) AS BIGINT) AS h,
CAST(minute(ts) AS BIGINT) AS m,
CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
epoch_us(ts) AS epoch_us
FROM events ORDER BY event_id""",
    "struct_funcs" ->
      """WITH packed AS (
  SELECT n_nationkey,
    struct_pack(name := n_name, rk := n_regionkey) AS s
  FROM nation
)
SELECT n_nationkey, s.name AS s_name, s.rk + 1 AS rk_next,
  CAST(length(s.name) AS BIGINT) AS name_len
FROM packed ORDER BY n_nationkey""",
    "sample_systematic" ->
      """SELECT o_orderpriority, count(*) AS n_sampled,
round(avg(o_totalprice), 2) AS avg_price
FROM orders WHERE o_orderkey % 20 = 0
GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
