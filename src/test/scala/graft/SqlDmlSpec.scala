package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL DML surface (CREATE TABLE / INSERT INTO / INSERT OVERWRITE
  * PARTITION) and join-strategy hints — the statement-level front end
  * a SQL-first user of the engine drives writes and plan control with.
  */
class SqlDmlSpec extends SparkSpec {

  private lazy val dspark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dml")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-dml-wh").toString)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("create table + insert into + insert overwrite partition") {
    // the builder config is ignored when a shared session already
    // exists (suite-wide getOrCreate), so clear BOTH the catalog
    // entries and any orphaned managed-table dirs from prior JVMs
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    Seq("kw_year", "kw_copy").foreach { t =>
      dspark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(
        dspark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    dspark.sql(
      """CREATE TABLE kw_year (word STRING, cnt BIGINT)
USING parquet PARTITIONED BY (year INT)""")

    dspark.sql(
      "INSERT INTO kw_year PARTITION (year=1999) VALUES ('cancer', 10L), ('review', 3L)")
    dspark.sql(
      "INSERT INTO kw_year PARTITION (year=2000) VALUES ('spark', 7L)")
    assert(dspark.table("kw_year").count() == 3)

    // dynamic partition overwrite: only the 1999 partition is replaced
    dspark.sql(
      "INSERT OVERWRITE kw_year PARTITION (year=1999) VALUES ('cancer', 11L)")
    val rows = dspark.table("kw_year").orderBy("year", "word")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == Seq(("cancer", 11L, 1999), ("spark", 7L, 2000)))

    // and CTAS round-trips the content
    dspark.sql("CREATE TABLE kw_copy USING parquet AS SELECT * FROM kw_year")
    assert(dspark.table("kw_copy").count() == 2)
  }

  test("join hints steer the physical strategy") {
    Tables(dspark, sfDir, "lineitem").createOrReplaceTempView("li")
    Tables(dspark, sfDir, "supplier").createOrReplaceTempView("sup")
    def planOf(hint: String): String = {
      val df = dspark.sql(
        s"""SELECT /*+ $hint */ count(*) AS n
FROM li JOIN sup ON l_suppkey = s_suppkey""")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planOf("BROADCAST(sup)").contains("BroadcastHashJoin"))
    val merged = planOf("SHUFFLE_MERGE(sup)")
    assert(merged.contains("SortMergeJoin"), merged.take(1500))
  }
}
