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

  /** ANSI-mode safety valves: try_* forms return NULL where the strict
    * forms would raise (division by zero, bad casts, long overflow) —
    * the pattern ingest jobs need so one malformed row cannot kill a
    * 100 TB stage.
    */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
        expr("try_divide(p_retailprice, p_size)").as("per_size"),
        expr("try_cast(p_name AS INT)").as("name_int"),
        expr("try_cast(p_size AS STRING)").as("size_str"),
        expr("try_add(p_partkey, 9223372036854775807)").as("overflow_add"))
      .orderBy("p_partkey")

  /** Map higher-order functions: build a per-order (line -> qty) map,
    * transform_values, map_filter, explode back to rows. The oracle is
    * the equivalent relational form — the map is a faithful roundtrip.
    */
  def mapHofFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(pmod(col("l_orderkey"), lit(10)) === 0)
      // line numbers repeat within an order in this corpus: pre-sum to
      // unique map keys (rounded at the agg, the float-parity pattern)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(round(sum("l_quantity"), 2).as("_q"))
      .groupBy("l_orderkey")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("l_linenumber"), col("_q"))))).as("m"))
      .select(col("l_orderkey"),
        explode(map_filter(
          transform_values(col("m"), (_, v) => v * 2),
          (_, v) => v > lit(20.0))))
      .toDF("l_orderkey", "ln", "qty2")
      .orderBy("l_orderkey", "ln")

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

  /** Spark 4 VARIANT: semi-structured values parsed once into the
    * binary variant encoding, then typed-path extraction — the scale
    * path for schema-on-read JSON (parse once, extract many, no
    * per-access string re-parse). Variant stays internal to the plan;
    * the output is typed scalars.
    */
  def variantFuncs(spark: SparkSession, dir: String): DataFrame = {
    val v = parse_json(col("props"))
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        variant_get(v, "$.k", "bigint").as("k_val"),
        try_variant_get(v, "$.missing", "string").as("missing_val"),
        is_variant_null(v).as("is_null"))
      .orderBy("event_id")
  }

  /** HLL sketch aggregates (datasketches): per-priority sketches,
    * estimate, and a union rollup — the mergeable-summary pattern a
    * 100 TB pipeline uses for distinct counting across partitions
    * without a global shuffle of raw keys. Engine-specific binary
    * sketches have no DuckDB twin: rows-only + SketchSpec error bounds.
    */
  def hllSketch(spark: SparkSession, dir: String): DataFrame = {
    val perPriority = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
    perPriority
      .select(col("o_orderpriority").as("grp"),
        hll_sketch_estimate(col("sk")).as("n_distinct"))
      .unionByName(perPriority
        .agg(hll_union_agg(col("sk")).as("sk"))
        .select(lit("ALL").as("grp"),
          hll_sketch_estimate(col("sk")).as("n_distinct")))
      .orderBy("grp")
  }

  /** Second string wave: split_part, translate, pad, reverse, instr,
    * format_string, regexp_extract_all (joined back to a scalar — the
    * driver's row-sort compare can't order array cells).
    */
  def stringFuncs2(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(2)).as("name_piece"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_name"), "a").cast("long").as("a_pos"),
        format_string("%s:%d", col("p_brand"), col("p_size")).as("brand_size"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), " ")
          .as("name_words"))
      .orderBy("p_partkey")

  /** Ordered string aggregation (deterministic via sort both sides). */
  def stringConcat(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "nation")
      .groupBy("n_regionkey")
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("nations"))
      .orderBy("n_regionkey")

  /** Unpivot/melt: wide per-line metrics to long (metric, value) rows —
    * the normalization step feature pipelines use before per-metric
    * aggregation. Oracle is the dialect-safe UNION ALL equivalent.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(pmod(col("l_orderkey"), lit(50)) === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** Boolean / filtered aggregates. */
  def aggBools(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_discount") > 0.05).as("n_discounted"),
        bool_and(col("l_quantity") > 0).as("all_positive"),
        bool_or(col("l_tax") > 0.07).as("any_high_tax"),
        count_if(col("l_shipdate") >= lit("1995-01-01")).as("n_recent"))
      .orderBy("l_returnflag")

  /** Full outer join: customers with orders above a threshold vs the
    * supplier id space — both unmatched sides surface with nulls.
    */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val bigCust = Tables(spark, dir, "orders")
      .where(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_big"))
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("key"), col("s_acctbal"))
    bigCust.join(supp, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        round(coalesce(col("s_acctbal"), lit(0.0)), 2).as("s_bal"))
      .orderBy("key")
  }

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL keep
    * duplicate cardinalities, unlike their DISTINCT forms).
    */
  def setopAllVariants(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables(spark, dir, "orders")
      .select(pmod(col("o_custkey"), lit(100)).as("b"))
    val b = Tables(spark, dir, "lineitem")
      .select(pmod(col("l_suppkey"), lit(100)).as("b"))
    // global aggregates: one row even when the multiset is empty (a
    // groupBy over empty input would emit no row; DuckDB's scalar
    // count(*) always does)
    val ia = a.intersectAll(b).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val ea = a.exceptAll(b).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    ea.unionByName(ia).orderBy("op")
  }

  /** Remaining JSON builtins from the SURVEY §2.2 row: json_tuple
    * (generator-style multi-field extraction), schema_of_json
    * (constant-folded schema inference), to_json (struct
    * serialization).
    */
  def jsonTupleFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .where(pmod(col("event_id"), lit(20)) === 0)
      .select(
        col("event_id"),
        json_tuple(col("props"), "k").as("k_str"),
        schema_of_json(lit("""{"k": 1}""")).as("props_schema"),
        to_json(struct(col("event_id").as("id"))).as("packed"))
      .orderBy("event_id")

  /** XML functions (Spark 4 native XML): to_xml -> from_xml roundtrip
    * must be identity, which makes the roundtripped columns
    * oracle-checkable as the ORIGINALS (DuckDB has no XML — the
    * roundtrip property sidesteps dialect entirely).
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .where(pmod(col("o_orderkey"), lit(25)) === 0)
    val xml = to_xml(struct(col("o_orderkey").as("k"),
      col("o_orderstatus").as("s")))
    o.select(col("o_orderkey"),
        from_xml(xml, lit("k BIGINT, s STRING")).as("p"))
      .select(col("o_orderkey"), col("p.k").as("rt_key"),
        col("p.s").as("rt_status"))
      .orderBy("o_orderkey")
  }

  /** max_by/min_by "argmax" aggregates: the row-valued extremum picker
    * (which order had the top price per priority band) without a
    * window — one map-side-combining hash agg instead of a full
    * per-group sort. Deterministic on this data: o_totalprice is
    * unique within every group at both checked SFs.
    */
  def minmaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"),
        max_by(col("o_orderdate"), col("o_totalprice")).as("top_date"),
        round(max(col("o_totalprice")), 2).as("top_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Bivariate statistical aggregates: correlation, covariance and the
    * least-squares regression family — partial+final combinable
    * co-moment sketches, so one pass and one shuffle at any scale.
    * Rounded like the other float aggregates (summation order across
    * partitions is engine-specific in the last ulps).
    */
  def corrFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covs"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covp"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4)
          .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2)
          .as("icept"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy("l_returnflag")

  /** Third string-scalar wave: positional split, char mapping,
    * affix/extraction helpers — all codegen'd built-ins with exact
    * DuckDB twins (split_part/translate/repeat/reverse/left/right/
    * instr-strpos/contains/starts_with).
    */
  def stringFuncs3(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
        reverse(col("p_name")).as("rev_name"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_name, 3)").as("r3"),
        instr(col("p_name"), "e").cast("long").as("first_e"),
        repeat(col("p_brand"), 2).as("brand2"),
        col("p_name").contains("red").as("has_red"),
        col("p_name").startsWith("blue").as("is_blue"))
      .orderBy("p_partkey")

  /** Fourth string/date scalar wave — the Spark 4 additions plus the
    * MySQL-compat family: dayname/monthname (3-letter names, DuckDB
    * strftime mirrors), substring_index, overlay, elt, find_in_set,
    * zeroifnull/nullifzero. Each has a closed-form DuckDB equivalent,
    * so the whole row is hash-checked; all codegen built-ins, one
    * scan, zero exchanges before the presentation sort.
    */
  def stringFuncs4(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .where(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"),
        expr("dayname(cast(o_orderdate as date))").as("dname"),
        expr("monthname(cast(o_orderdate as date))").as("mname"),
        substring_index(col("o_orderpriority"), "-", 1).as("prio_code"),
        expr("overlay(o_orderpriority placing 'X' from 2 for 1)")
          .as("overlaid"),
        expr("elt(1 + cast(o_orderkey % 3 as int), 'alpha', 'beta', 'gamma')")
          .as("elt_pick"),
        expr("find_in_set(o_orderstatus, 'O,F,P')").cast("long")
          .as("status_slot"),
        expr("zeroifnull(nullif(o_custkey % 5, 0))").cast("long")
          .as("cust_z"),
        expr("nullifzero(o_custkey % 5)").cast("long").as("cust_n"))
      .orderBy("o_orderkey")

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): nulls
    * manufactured with nullif on both sides so NULL keys MATCH each
    * other — the semantics plain `=` silently drops. Still planned as
    * a hash equi join (null-safe equality is a valid equi key), not a
    * nested loop.
    */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"),
        nullif(col("n_regionkey"), lit(2)).as("rk"))
    val r = Tables(spark, dir, "region")
      .select(nullif(col("r_regionkey"), lit(2)).as("rk2"),
        col("r_name"))
    n.join(r, col("rk") <=> col("rk2"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")
  }

  /** explode_outer: generator that KEEPS rows whose array is empty
    * (null element) — the difference between "docs with long words"
    * and "all docs annotated with long words", which inner explode
    * silently conflates.
    */
  def explodeOuterFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode_outer(filter(graft.text.TextOps.tokens(col("text")),
          t => length(t) > 11)).as("long_word"))
      .orderBy("doc_id", "long_word")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "array_explode_outer" -> explodeOuterFuncs,
    "join_null_safe" -> joinNullSafe,
    "string_funcs3" -> stringFuncs3,
    "string_funcs4" -> stringFuncs4,
    "agg_minmax_by" -> minmaxBy,
    "agg_corr_regr" -> corrFuncs,
    "xml_roundtrip" -> xmlRoundtrip,
    "json_tuple_funcs" -> jsonTupleFuncs,
    "join_full_outer" -> joinFullOuter,
    "setop_all_variants" -> setopAllVariants,
    "agg_bools" -> aggBools,
    "string_funcs2" -> stringFuncs2,
    "agg_string_concat" -> stringConcat,
    "unpivot_metrics" -> unpivotMetrics,
    "cond_funcs" -> condFuncs,
    "cond_try_funcs" -> tryFuncs,
    "map_hof_funcs" -> mapHofFuncs,
    "bit_funcs" -> bitFuncs,
    "hash_funcs" -> hashFuncs,
    "ts_funcs" -> tsFuncs,
    "struct_funcs" -> structFuncs,
    "sample_systematic" -> sampleSystematic,
    "json_variant" -> variantFuncs,
    "agg_hll_sketch" -> hllSketch)

  val oracle: Map[String, String] = Map(
    "array_explode_outer" ->
      raw"""WITH t AS (
  SELECT doc_id, list_filter(list_filter(string_split_regex(
    lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'),
    w -> w <> ''), w -> length(w) > 11) AS l
  FROM documents
)
SELECT doc_id,
  unnest(CASE WHEN len(l) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE l END)
    AS long_word
FROM t ORDER BY doc_id, long_word""",
    "join_null_safe" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name
FROM (SELECT n_nationkey, n_name, nullif(n_regionkey, 2) AS rk
      FROM nation) n
JOIN (SELECT nullif(r_regionkey, 2) AS rk2, r_name FROM region) r
  ON n.rk IS NOT DISTINCT FROM r.rk2
ORDER BY n_nationkey""",
    "string_funcs4" ->
      """SELECT o_orderkey,
  strftime(o_orderdate, '%a') AS dname,
  strftime(o_orderdate, '%b') AS mname,
  array_to_string(list_slice(string_split(o_orderpriority, '-'), 1, 1), '-')
    AS prio_code,
  substr(o_orderpriority, 1, 1) || 'X' || substr(o_orderpriority, 3)
    AS overlaid,
  CASE (1 + o_orderkey % 3) WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
    ELSE 'gamma' END AS elt_pick,
  CAST(coalesce(list_position(string_split('O,F,P', ','), o_orderstatus), 0)
    AS BIGINT) AS status_slot,
  CAST(coalesce(nullif(o_custkey % 5, 0), 0) AS BIGINT) AS cust_z,
  CAST(nullif(o_custkey % 5, 0) AS BIGINT) AS cust_n
FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""",
    "string_funcs3" ->
      """SELECT p_partkey,
  split_part(p_name, ' ', 2) AS second_word,
  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
  reverse(p_name) AS rev_name,
  left(p_name, 5) AS l5,
  right(p_name, 3) AS r3,
  CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
  repeat(p_brand, 2) AS brand2,
  contains(p_name, 'red') AS has_red,
  starts_with(p_name, 'blue') AS is_blue
FROM part ORDER BY p_partkey""",
    "agg_minmax_by" ->
      """SELECT o_orderpriority,
  arg_max(o_orderkey, o_totalprice) AS top_order,
  arg_min(o_orderkey, o_totalprice) AS bottom_order,
  arg_max(o_orderdate, o_totalprice) AS top_date,
  round(max(o_totalprice), 2) AS top_price,
  count(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_corr_regr" ->
      """SELECT l_returnflag,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  round(covar_samp(l_quantity, l_extendedprice), 2) AS covs,
  round(covar_pop(l_quantity, l_extendedprice), 2) AS covp,
  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
  regr_count(l_extendedprice, l_quantity) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "map_hof_funcs" ->
      """SELECT l_orderkey, l_linenumber AS ln,
round(sum(l_quantity), 2) * 2 AS qty2
FROM lineitem
WHERE l_orderkey % 10 = 0
GROUP BY l_orderkey, l_linenumber
HAVING round(sum(l_quantity), 2) * 2 > 20
ORDER BY l_orderkey, ln""",
    "cond_try_funcs" ->
      """SELECT p_partkey,
CAST(NULL AS DOUBLE) AS div0,
p_retailprice / p_size AS per_size,
TRY_CAST(p_name AS INT) AS name_int,
CAST(p_size AS VARCHAR) AS size_str,
CASE WHEN p_partkey > 0 THEN NULL
     ELSE 9223372036854775807 END AS overflow_add
FROM part ORDER BY p_partkey""",
    "xml_roundtrip" ->
      """SELECT o_orderkey, o_orderkey AS rt_key,
o_orderstatus AS rt_status
FROM orders WHERE o_orderkey % 25 = 0 ORDER BY o_orderkey""",
    "json_tuple_funcs" ->
      """SELECT event_id,
json_extract_string(props, '$.k') AS k_str,
'STRUCT<k: BIGINT>' AS props_schema,
printf('{"id":%d}', event_id) AS packed
FROM events WHERE event_id % 20 = 0 ORDER BY event_id""",
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
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "json_variant" ->
      """SELECT event_id,
CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
CAST(NULL AS VARCHAR) AS missing_val,
false AS is_null
FROM events ORDER BY event_id""",
    "join_full_outer" ->
      """WITH bc AS (
  SELECT o_custkey AS key, count(*) AS n_big
  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey
), sp AS (SELECT s_suppkey AS key, s_acctbal FROM supplier)
SELECT coalesce(bc.key, sp.key) AS key,
  coalesce(n_big, 0) AS n_big,
  round(coalesce(s_acctbal, 0.0), 2) AS s_bal
FROM bc FULL OUTER JOIN sp ON bc.key = sp.key
ORDER BY key""",
    "setop_all_variants" ->
      """WITH a AS (SELECT o_custkey % 100 AS b FROM orders),
b AS (SELECT l_suppkey % 100 AS b FROM lineitem),
ia AS (SELECT count(*) AS n FROM (SELECT b FROM a INTERSECT ALL SELECT b FROM b)),
ea AS (SELECT count(*) AS n FROM (SELECT b FROM a EXCEPT ALL SELECT b FROM b))
SELECT 'except_all' AS op, n FROM ea
UNION ALL SELECT 'intersect_all', n FROM ia
ORDER BY op""",
    "agg_bools" ->
      """SELECT l_returnflag,
CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
bool_and(l_quantity > 0) AS all_positive,
bool_or(l_tax > 0.07) AS any_high_tax,
CAST(count_if(l_shipdate >= TIMESTAMP '1995-01-01') AS BIGINT) AS n_recent
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "string_funcs2" ->
      """SELECT p_partkey,
split_part(p_name, ' ', 2) AS name_piece,
translate(p_brand, '#', '-') AS brand_dash,
lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
reverse(p_brand) AS brand_rev,
CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
printf('%s:%d', p_brand, p_size) AS brand_size,
array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ') AS name_words
FROM part ORDER BY p_partkey""",
    "agg_string_concat" ->
      """SELECT n_regionkey,
string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "unpivot_metrics" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
    l_quantity AS value FROM lineitem WHERE l_orderkey % 50 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey % 50 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey % 50 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
  FROM lineitem WHERE l_orderkey % 50 = 0
)
ORDER BY l_orderkey, l_linenumber, metric""")
}
