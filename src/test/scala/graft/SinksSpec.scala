package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.Sinks

class SinksSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sink").toString

  test("partitioned write creates partition dirs and roundtrips") {
    val out = tmpDir()
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("year", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, out, Seq("year"), chunks = 2)
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("year="))
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    // partition pruning: a year filter must prune to one partition dir
    val pruned = back.where(col("year") === 2023)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(back.select("year").distinct().count() > 1)
    assert(pruned.count() ==
      orders.where(year(col("o_orderdate")) === 2023).count())
  }

  test("idempotent re-run: second overwrite write equals first") {
    val out = tmpDir()
    val df = Tables(spark, sfDir, "region")
    Sinks.writePartitioned(df, out, Seq("r_name"))
    val first = spark.read.parquet(out).collect().map(_.toSeq).toSet
    Sinks.writePartitioned(df, out, Seq("r_name"))
    val second = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(first == second)
  }

  test("headerless csv matches the reference output contract") {
    val out = tmpDir() + "/csv"
    val kw = graft.queries.PipelineQueries.pubmedGoldenV1(spark, sfDir)
    Sinks.writeKeywordCsv(kw, out)
    val lines = spark.read.text(out).collect().map(_.getString(0)).sorted
    assert(lines.length == 7)
    assert(lines.contains("man,123456") && lines.contains("article,123456"))
  }

  test("notYetWritten anti-joins against sink contents") {
    val out = tmpDir() + "/sink"
    val nations = Tables(spark, sfDir, "nation")
    // empty sink: everything pending
    val all = Sinks.notYetWritten(spark, nations, out, Seq("n_nationkey"))
    assert(all.count() == nations.count())
    // write half, expect the other half pending
    nations.where(col("n_nationkey") < 12).write.parquet(out)
    val pending = Sinks.notYetWritten(spark, nations, out, Seq("n_nationkey"))
    assert(pending.count() == nations.where(col("n_nationkey") >= 12).count())
  }

  test("dynamic partition upsert rewrites only touched partitions") {
    val out = tmpDir()
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("year", year(col("o_orderdate")))
    val years = orders.select("year").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.length > 1)
    Sinks.upsertPartitions(orders, out, Seq("year"))
    val untouchedDir = new java.io.File(s"$out/year=${years.head}")
    val before = untouchedDir.listFiles().map(_.getName).toSet

    // batch touching ONLY the last year, with modified values
    val batch = orders.where(col("year") === years.last)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Sinks.upsertPartitions(batch, out, Seq("year"))

    // untouched partition: same files; touched partition: new content
    assert(untouchedDir.listFiles().map(_.getName).toSet == before)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    val doubled = back.where(col("year") === years.last)
      .agg(round(sum("o_totalprice"), 2)).head().getDouble(0)
    val orig = orders.where(col("year") === years.last)
      .agg(round(sum("o_totalprice") * 2, 2)).head().getDouble(0)
    assert(math.abs(doubled - orig) < 1e-6)
  }

  test("compaction shrinks file count and preserves the data") {
    val out = tmpDir() + "/frag"
    val li = Tables(spark, sfDir, "lineitem")
    li.repartition(64).write.parquet(out) // 64 small fragments
    val beforeFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(beforeFiles >= 32)
    val beforeSum = li.agg(round(sum("l_quantity"), 2)).head().getDouble(0)

    Sinks.compact(spark, out, targetBytes = 1L << 20)

    val afterFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(afterFiles < beforeFiles,
      s"compaction did not shrink: $beforeFiles -> $afterFiles")
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(math.abs(back.agg(round(sum("l_quantity"), 2)).head().getDouble(0)
      - beforeSum) < 1e-6)
    // no leftover staging dirs
    val parent = new java.io.File(out).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("_compact")), parent.mkString(","))
  }

  test("orc roundtrip preserves schema and rows") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-orc").toString + "/nation_orc"
    val nations = Tables(spark, sfDir, "nation")
    nations.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === nations.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nations.orderBy("n_nationkey").collect().toSeq)
  }

  test("salted join rejects right/full join types") {
    val li = Tables(spark, sfDir, "lineitem").limit(10)
      .select(col("l_orderkey").as("o_orderkey"))
    val o = Tables(spark, sfDir, "orders").limit(10)
      .select(col("o_orderkey"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(li, o, "o_orderkey", salts = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(li, o, "o_orderkey", salts = 4, joinType = "full_outer")
    }
  }

  test("salted left_anti equals plain left_anti") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey")).distinct()
    val o = Tables(spark, sfDir, "orders")
      .where(col("o_orderkey") < 1000).select("o_orderkey")
    val plain = li.join(o, Seq("o_orderkey"), "left_anti").count()
    val salted = SkewJoin.saltedJoin(li, o, "o_orderkey",
      salts = 8, joinType = "left_anti").count()
    assert(plain === salted)
  }

  test("versioned snapshots: immutable, pinned reads, incomplete invisible") {
    import graft.sources.Sinks
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vsink").toString
    val v1 = Sinks.writeVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    val v2 = Sinks.writeVersion(Seq((1L, "a2")).toDF("k", "s"), root)
    assert(v1 == 1L && v2 == 2L && Sinks.listComplete(root) == Seq(1L, 2L))
    // pinned read is unaffected by the later snapshot
    assert(Sinks.readVersion(spark, root, 1L).count() == 2)
    assert(Sinks.readLatest(spark, root).as[(Long, String)].collect()
      .toSet == Set((1L, "a2")))
    // a crash mid-write (data landed, marker didn't) stays invisible to
    // readers AND is not counted when numbering the next version
    val orphan = new java.io.File(s"$root/v=3")
    Seq((9L, "x")).toDF("k", "s").write.parquet(orphan.toString)
    assert(Sinks.listComplete(root) == Seq(1L, 2L))
    assert(Sinks.readLatest(spark, root).count() == 1)
    intercept[IllegalArgumentException] {
      Sinks.readVersion(spark, root, 3L)
    }
    // the next writer skips PAST the orphan (no collision) and its
    // snapshot becomes the new latest
    val v4 = Sinks.writeVersion(Seq((7L, "z")).toDF("k", "s"), root)
    assert(v4 == 4L && Sinks.listComplete(root) == Seq(1L, 2L, 4L))
    assert(Sinks.readLatest(spark, root).count() == 1)
  }

  test("salted join equals plain join") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewJoin.saltedJoin(li, o, "o_orderkey", salts = 8)
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
  }
}
