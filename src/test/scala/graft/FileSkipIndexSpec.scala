package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{FileSkipIndex, ZOrder}

/** File-skipping index over a Z-order-clustered layout: pruned reads
  * must equal the full-scan filter exactly, and the clustered layout
  * must actually let ranges skip files (that is the point of pairing
  * the index with ZOrder.clusterWrite).
  */
class FileSkipIndexSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")

  test("pruned range read == full-scan filter; clustered ranges skip files") {
    val dataDir = Files.createTempDirectory("skip-data").toString
    val idxDir = Files.createTempDirectory("skip-idx").toString
    ZOrder.clusterWrite(li, "l_extendedprice", "l_quantity",
      numFiles = 16, path = dataDir)
    FileSkipIndex.writeIndex(spark, dataDir,
      Seq("l_extendedprice", "l_quantity"), idxDir)

    val (lo, hi) = (1000.0, 2000.0)
    val pruned = FileSkipIndex.prunedRead(spark, dataDir, idxDir,
        "l_extendedprice", lo, hi)
      .orderBy("l_orderkey", "l_partkey", "l_extendedprice")
      .collect().toSeq
    val full = spark.read.parquet(dataDir)
      .where(col("l_extendedprice").between(lo, hi))
      .orderBy("l_orderkey", "l_partkey", "l_extendedprice")
      .collect().toSeq
    assert(pruned == full)
    assert(full.nonEmpty, "test range must select something")

    val (touched, total) = FileSkipIndex.pruneStats(spark, idxDir,
      "l_extendedprice", lo, hi)
    assert(total == 16)
    assert(touched < total / 2,
      s"clustered layout should skip most files: touched $touched/$total")
    // the second clustered dimension skips too (z-order, not a sort)
    val (tq, _) = FileSkipIndex.pruneStats(spark, idxDir,
      "l_quantity", 1.0, 5.0)
    assert(tq < total,
      s"secondary dimension should also skip: touched $tq/$total")
  }

  test("empty-range prune reads nothing but keeps the schema") {
    val dataDir = Files.createTempDirectory("skip-data2").toString
    val idxDir = Files.createTempDirectory("skip-idx2").toString
    ZOrder.clusterWrite(li, "l_extendedprice", "l_quantity", 4, dataDir)
    FileSkipIndex.writeIndex(spark, dataDir, Seq("l_extendedprice"), idxDir)
    val out = FileSkipIndex.prunedRead(spark, dataDir, idxDir,
      "l_extendedprice", -2.0, -1.0)
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("l_quantity"))
  }

  test("bloom index: equality probes open ~1 file, absent keys ~0, results exact") {
    val dataDir = Files.createTempDirectory("bloom-data").toString
    val idxDir = Files.createTempDirectory("bloom-idx").toString
    // layout UNCORRELATED with the key: hash-repartitioned files, the
    // case where min/max zone maps cannot prune an equality probe but
    // a Bloom can
    li.repartition(16, col("l_partkey"))
      .write.mode("overwrite").parquet(dataDir)
    FileSkipIndex.writeBloomIndex(spark, dataDir, "l_orderkey", idxDir,
      expectedItemsPerFile = 10000L)

    val present = li.select("l_orderkey").head().getLong(0)
    val pruned = FileSkipIndex.bloomPrunedRead(spark, dataDir, idxDir,
        "l_orderkey", present)
      .orderBy("l_orderkey", "l_partkey", "l_extendedprice")
      .collect().toSeq
    val full = spark.read.parquet(dataDir)
      .where(col("l_orderkey") === present)
      .orderBy("l_orderkey", "l_partkey", "l_extendedprice")
      .collect().toSeq
    assert(pruned == full)
    assert(full.nonEmpty)

    // the key's rows live in few files; bloom opens those + ~fpp misses
    val (touched, total) = FileSkipIndex.bloomPruneStats(spark, idxDir,
      present)
    assert(total == 16)
    assert(touched <= 8, s"bloom should skip most files: $touched/$total")

    // a key that cannot exist: definitely-absent everywhere
    val (tAbsent, _) = FileSkipIndex.bloomPruneStats(spark, idxDir,
      -987654321L)
    assert(tAbsent <= 2, s"absent key should prune ~all files: $tAbsent")
    assert(FileSkipIndex.bloomPrunedRead(spark, dataDir, idxDir,
      "l_orderkey", -987654321L).count() == 0)
  }
}
