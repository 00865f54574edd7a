package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Static + dynamic partition pruning against a year-partitioned fact
  * table — the scan must touch only the partitions the query needs
  * (at 100 TB this is the difference between reading one year and
  * reading the lake).
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    Tables(spark, sfDir, "orders")
      .withColumn("year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("year").parquet(dir)
    dir
  }

  test("static pruning: a year literal prunes the file listing") {
    val fact = spark.read.parquet(factDir)
    val pruned = fact.where(col("year") === 2022)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(year"),
      s"expected partition filters in:\n$plan")
    val expected = Tables(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 2022).count()
    assert(pruned.count() == expected)
  }

  test("dynamic pruning: a filtered dim join prunes fact partitions") {
    // without table stats the cost heuristic skips DPP; use the
    // fallback-ratio heuristic (what a real lake with ANALYZE'd dims
    // gets from stats)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val fact = spark.read.parquet(factDir)
    import spark.implicits._
    // the dim must be a real source (a filtered LocalRelation constant-
    // folds away, leaving no selective predicate for DPP to see)
    val dimDir = Files.createTempDirectory("graft-dim").toString
    Seq((2022, "target"), (2023, "other")).toDF("year", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.where(col("tag") === "target"), "year")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic pruning subquery in:\n$plan")
    val expected = Tables(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 2022).count()
    assert(joined.count() == expected)
  }
}
