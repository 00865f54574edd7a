package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{TopKPerKey, TopKPerKeyRewrite, TopKPerKeyStrategy}

import graft.Tables

/** Queries exercising the engine's custom whole-operator plan pieces
  * (LogicalPlan + SparkStrategy + SparkPlan, SURVEY.md §4.3) — each is
  * pinned to a DuckDB oracle expressing the same semantics with stock
  * SQL, so the custom physical path is hash-checked against the
  * declarative definition.
  */
object PlanOps {

  /** Native bounded-heap top-k per key (org.apache.spark.sql.graftx
    * .TopKPerKey): top 3 orders per priority by price. Semantically
    * identical to the window row_number formulation; physically the
    * shuffle carries at most k rows per key per input partition.
    */
  def topKNative(spark: SparkSession, dir: String): DataFrame =
    TopKPerKey.topK(
        Tables(spark, dir, "orders")
          .select("o_orderpriority", "o_orderkey", "o_totalprice"),
        keys = Seq("o_orderpriority"),
        order = Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
      .orderBy("o_orderpriority", "rank")

  /** The OPTIMIZER-RULE path: the query is written as the plain window
    * row_number + filter, and TopKPerKeyRewrite (session-scoped via
    * newSession — the library entry point is GraftExtensions) turns it
    * into the native bounded-heap operator. Same oracle shape proves
    * the rewrite is semantics-preserving.
    */
  def topKRewrite(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    spark.experimental.extraOptimizations = Seq(TopKPerKeyRewrite)
    spark.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir, "customer")
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 2)
      .orderBy("c_nationkey", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_topk_native" -> topKNative,
    "window_topk_rewrite" -> topKRewrite)

  val oracle: Map[String, String] = Map(
    "window_topk_native" ->
      """WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    row_number() OVER (
      PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice, rank
FROM ranked WHERE rank <= 3
ORDER BY o_orderpriority, rank""",
    "window_topk_rewrite" ->
      """WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
    CAST(row_number() OVER (
      PARTITION BY c_nationkey
      ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank
  FROM customer
)
SELECT c_nationkey, c_custkey, c_acctbal, rank
FROM ranked WHERE rank <= 2
ORDER BY c_nationkey, rank""")
}
