package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness-table access. One parquet file per table under the scale-factor
  * dir (see /root/repo/TESTDATA.md). Reads are plain parquet scans so
  * Catalyst column pruning + predicate pushdown apply at the source.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalization — the generator's physical type has
    * varied across rounds, so adapt by schema instead of assuming one:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
    *    nanos as long and convert with integer division (`div`, not
    *    `/` — the double path would lose precision on ~1.7e18
    *    epoch-nanos). µs-aligned input makes this exact.
    *  - TIMESTAMP_NTZ (timestamp[us] with no tz): cast to session-tz
    *    TimestampType — the session is pinned to UTC everywhere
    *    (Bench/Verify/specs), so the instant is unchanged and DuckDB's
    *    naive read of the same file agrees.
    *  - TimestampType: already what downstream expects.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
