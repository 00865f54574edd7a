package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Partition-skew diagnostic (SURVEY.md §2.1 O6): the reference's
  * `glom()`-style per-partition row-count probe (reference
  * spark-pubmed/job_pubmed_submit.py's repartition(12) sizing loop),
  * re-expressed as a REGISTERED query instead of a driver-side print:
  * hash-repartition the fact table on the join key, then count rows and
  * distinct keys per physical partition with `spark_partition_id()` —
  * the exact numbers an operator reads before picking shuffle
  * partition counts / salting for a 100 TB run. One shuffle, one agg.
  *
  * The oracle is the interesting part: `spark_partition_id()` after
  * `repartition(n, key)` is pinned as `pmod(murmur3_32(key, seed=42),
  * n)` — Spark's documented HashPartitioning contract — and the DuckDB
  * side EMULATES Murmur3 (x86_32, Spark's long-input variant: two
  * 4-byte mixes + fmix, seed 42) in pure 32-bit modular SQL arithmetic
  * over the distinct keys, then joins the pid map back to the rows. A
  * hash-match therefore proves the physical placement contract, not
  * just the counts.
  */
object ScaleDiag {

  val numPartitions = 32

  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"))
      .repartition(numPartitions, col("l_suppkey"))
      .withColumn("pid", spark_partition_id().cast("long"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("l_suppkey").as("n_keys"))
      .orderBy("pid")

  // ---- DuckDB-side Murmur3 emulation ------------------------------
  // 32-bit lanes carried as BIGINT in [0, 2^32); multiplications route
  // through HUGEINT (the 64-bit product overflows BIGINT). DuckDB
  // parses <<, >> and | at ONE precedence level, left-associative, so
  // every shift is fully parenthesized. Constants are Murmur3's
  // public c1/c2/fmix values and Spark's seed 42.

  private def mul32(x: String, c: Long): String =
    s"CAST((CAST($x AS HUGEINT) * $c) % 4294967296 AS BIGINT)"
  private def rotl(x: String, r: Int): String =
    s"(((($x) << $r) | (($x) >> ${32 - r})) % 4294967296)"
  private def mixK1(k: String): String =
    mul32(rotl(mul32(k, 3432918353L), 15), 461845907L)
  private def mixH1(h: String, k: String): String =
    s"(((${rotl(s"xor($h, $k)", 13)}) * 5 + 3864292196) % 4294967296)"
  private def shmix(h: String, s: Int): String =
    s"xor($h, ($h) >> $s)"

  /** Full oracle: pid = pmod(signed(fmix(mixH1x2(key))), n) per
    * DISTINCT key (the mix chain runs |keys| times, not |rows| times),
    * joined back for the per-partition profile.
    */
  private[queries] def skewOracleSql: String =
    s"""WITH keys AS (SELECT DISTINCT l_suppkey FROM lineitem),
b AS (SELECT l_suppkey,
  CAST(CAST(l_suppkey AS UBIGINT) % 4294967296 AS BIGINT) AS lo,
  CAST((CAST(l_suppkey AS UBIGINT) // 4294967296) % 4294967296 AS BIGINT) AS hi
  FROM keys),
m1 AS (SELECT l_suppkey, hi, ${mixH1("42", mixK1("lo"))} AS h1 FROM b),
m2 AS (SELECT l_suppkey, ${mixH1("h1", mixK1("hi"))} AS h2 FROM m1),
f1 AS (SELECT l_suppkey, ${shmix("xor(h2, 8)", 16)} AS f FROM m2),
f2 AS (SELECT l_suppkey, ${shmix(mul32("f", 2246822507L), 13)} AS f FROM f1),
f3 AS (SELECT l_suppkey, ${shmix(mul32("f", 3266489909L), 16)} AS f FROM f2),
hs AS (SELECT l_suppkey,
  CASE WHEN f >= 2147483648 THEN f - 4294967296 ELSE f END AS h FROM f3),
pidmap AS (SELECT l_suppkey, ((h % $numPartitions) + $numPartitions) % $numPartitions AS pid FROM hs)
SELECT pid, count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_keys
FROM lineitem JOIN pidmap USING (l_suppkey)
GROUP BY pid ORDER BY pid"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scale_skew_profile" -> skewProfile)

  val oracle: Map[String, String] = Map(
    "scale_skew_profile" -> skewOracleSql)
}
