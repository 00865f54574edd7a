package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-shuffled storage layout so repeated
  * joins on the bucket key run with NO exchange — the storage-level
  * answer to "is there a shuffle here that becomes the bottleneck at
  * scale" for fact-fact joins repeated across a pipeline.
  */
class BucketingSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-warehouse").toString
  private lazy val bspark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("bucketed tables join without an exchange") {
    // the shared session ignores warehouse.dir config; clear both the
    // catalog entries and any orphaned managed-table directories from
    // prior JVMs, or saveAsTable fails with LOCATION_ALREADY_EXISTS
    Seq("orders_b", "lineitem_b").foreach { t =>
      bspark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        bspark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val orders = Tables(bspark, sfDir, "orders")
    val lineitem = Tables(bspark, sfDir, "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = bspark.table("lineitem_b")
      .join(bspark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not re-shuffle either side: the only
    // exchange allowed is the one feeding the final aggregation
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not exchange on the join key:\n$plan")

    // and the result matches the unbucketed join
    val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    joined.collect().foreach { r =>
      assert(math.abs(expected(r.getString(0)) - r.getDouble(1)) < 1e-6)
    }
  }
}
