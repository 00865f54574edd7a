package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.InterleaveBits

import graft.operators.{BloomPrune, HeavyHitters, RangeJoin, ZOrder}
import graft.text.TextOps

/** Scale-layout operators: Z-order clustering and Bloom join pruning. */
class ScaleOpsSpec extends SparkSpec {

  // one-bit-at-a-time reference model for the magic-mask spread
  private def naiveZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave_bits matches the naive bit-by-bit model") {
    import spark.implicits._
    val probes = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (12345L, 67890L), (0xDEADBEEFL, 0xCAFEBABEL),
      (1L << 31, 1L << 31), (0x55555555L, 0xAAAAAAAAL))
    val got = probes.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    val want = probes.map { case (x, y) => naiveZ(x, y) }
    assert(got.toSeq == want)
  }

  test("z-order sort preserves locality in BOTH dimensions") {
    // adjacent z-values should be near each other in (x, y) on average;
    // the concrete claim that matters for skipping: files cut from a
    // z-sorted layout have small bounding boxes on both keys, a linear
    // sort only on its own key.
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val dir = Files.createTempDirectory("graft-zorder").toString

    ZOrder.clusterWrite(li, "l_partkey", "l_suppkey", 8, s"$dir/z")
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def avgRangeFraction(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
      val global = df.agg(
        min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head()
      val span = global.getDouble(1) - global.getDouble(0)
      val perFile = df
        .groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).cast("double").as("w"))
        .agg(avg(col("w"))).head().getDouble(0)
      perFile / span
    }

    val zPart = avgRangeFraction(s"$dir/z", "l_partkey")
    val zSupp = avgRangeFraction(s"$dir/z", "l_suppkey")
    val linPart = avgRangeFraction(s"$dir/linear", "l_partkey")
    val linSupp = avgRangeFraction(s"$dir/linear", "l_suppkey")

    // linear: near-perfect on its sort key, useless on the other
    assert(linPart < 0.3, s"linear layout should be tight on partkey: $linPart")
    assert(linSupp > 0.8, s"linear layout has no suppkey locality: $linSupp")
    // z-order: strictly better than linear on the second key, and far
    // from full-range on both
    assert(zSupp < 0.75, s"z-order suppkey bounding boxes too wide: $zSupp")
    assert(zSupp < linSupp, s"z-order ($zSupp) must beat linear ($linSupp) on suppkey")
    assert(zPart < 0.75, s"z-order partkey bounding boxes too wide: $zPart")
  }

  test("misra-gries candidates keep every item above the N/(m+1) bound") {
    import spark.implicits._
    // 500×a + 300×b + 1000 singletons, scattered over 4 partitions:
    // N=1800, m=10 → bound N/(m+1) ≈ 164; a and b MUST survive.
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      (0 until 1000).map(i => s"u$i")
    val df = scala.util.Random.shuffle(rows).toDF("item").repartition(4)
    val cand = HeavyHitters.candidates(df, "item", m = 10)
      .as[String].collect().toSet
    assert(cand.contains("a") && cand.contains("b"))
    // and the summary stays bounded: ≤ m per partition
    assert(cand.size <= 4 * 10)
  }

  test("cms ranking matches the exact recount and obeys the error bound") {
    val toks = Tables(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val n = toks.count()
    val exact = HeavyHitters.exactTopK(toks, "token", k = 10, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val approx = HeavyHitters.approxTopK(toks, "token", k = 10, m = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(exact.map(_._1).toSet == approx.keySet,
      "cms and exact recount must agree on the top-k set here")
    exact.foreach { case (item, trueCnt) =>
      val est = approx(item)
      assert(est >= trueCnt, s"CMS is one-sided: $item est=$est true=$trueCnt")
      assert(est <= trueCnt + (1e-3 * n).toLong + 1,
        s"CMS error bound blown: $item est=$est true=$trueCnt n=$n")
    }
  }

  test("binned interval join equals the naive range join, each pair once") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val parts = Tables(spark, sfDir, "part")
      .select(col("p_partkey"),
        (col("p_retailprice") * lit(0.95)).as("lo"),
        (col("p_retailprice") * lit(1.05)).as("hi"))
    val binned = RangeJoin.binnedIntervalJoin(li, parts,
        "l_extendedprice", "lo", "hi", binWidth = 5000.0)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val naive = li.join(parts,
        col("l_extendedprice") >= col("lo") &&
          col("l_extendedprice") <= col("hi"))
      .select("l_orderkey", "l_linenumber", "p_partkey")
    // exceptAll both ways: bag equality = same pairs, same multiplicity
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() > 0)
    // and the plan is an equi join on the bin, not a nested loop
    val plan = RangeJoin.binnedIntervalJoin(li, parts,
      "l_extendedprice", "lo", "hi", 5000.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("AQE splits skewed partitions in a sort-merge join") {
    // the runtime answer to skew, next to the manual SkewJoin.saltedJoin:
    // lowered thresholds stand in for the default 256MB at test scale
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val left = s.range(0, 200000).select(
      when(col("id") < 150000, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = s.range(0, 2000).select(
      col("id").as("k"), (col("id") * 2).as("w"))
    val j = left.join(right, "k")
    // collect() (not count()) so THIS queryExecution runs and its
    // adaptive plan finalizes
    assert(j.collect().length == 150000) // only k=0 has a partner
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE skew split did not fire:\n${plan.take(3000)}")
  }

  test("AQE converts a planned sort-merge join to broadcast at runtime") {
    // a UDF filter hides the selectivity from static planning (no
    // stats -> SMJ); the post-shuffle runtime size is tiny, so AQE
    // re-plans the join as broadcast — the mechanism that saves the
    // statically-mis-estimated joins a 100 TB pipeline inevitably has
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    val keepFew = udf((k: Long) => k % 997 == 0)
    val small = Tables(s, sfDir, "orders")
      .where(keepFew(col("o_orderkey")))
      .select(col("o_orderkey"), col("o_totalprice"))
    val big = Tables(s, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val j = big.join(small, col("l_orderkey") === col("o_orderkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE did not convert to broadcast:\n${plan.take(2000)}")
  }

  test("observe() rides metrics on the job instead of extra count jobs") {
    // funnel observability without re-running stages: the metrics are
    // computed inside the SAME action (works identically in streaming)
    val observed = Tables(spark, sfDir, "lineitem")
      .observe("scan_metrics",
        count(lit(1)).as("rows_scanned"),
        sum(col("l_quantity")).as("qty_total"))
      .where(col("l_discount") > 0.05)
    // collect() (not count()) so the observe node runs in THIS df's
    // query execution — count() builds its own
    val kept = observed.collect().length
    val m = observed.queryExecution.observedMetrics("scan_metrics")
    assert(m.getAs[Long]("rows_scanned") > kept,
      s"metric ${m.getAs[Long]("rows_scanned")} vs kept $kept")
    assert(m.getAs[Double]("qty_total") > 0)
  }

  test("_metadata hidden column exposes file lineage at zero scan cost") {
    val withLineage = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("_metadata.file_path").as("src"),
        col("_metadata.row_index").as("row_idx"))
      .limit(5).collect()
    assert(withLineage.forall(_.getString(1).contains("lineitem.parquet")))
    assert(withLineage.map(_.getLong(2)).distinct.length > 1)
  }

  test("partition-size diagnostic aggregates distributed (SURVEY O6)") {
    // the reference printed rdd.glom().map(len).collect() — an
    // all-to-driver collect; the engine spelling is one tiny agg
    val ev = Tables(spark, sfDir, "events").repartition(8, col("user_id"))
    val sizes = ev.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(sizes.map(_._2).sum == ev.count())
    assert(sizes.length > 1 && sizes.forall { case (pid, _) => pid < 8 })
  }

  test("bloom prefiltered join is exact and the prefilter is selective") {
    val dim = Tables(spark, sfDir, "supplier")
      .where(pmod(col("s_suppkey"), lit(7)) === 0)
      .select(col("s_suppkey"))
    val fact = Tables(spark, sfDir, "lineitem")

    val pruned = BloomPrune.prefilteredJoin(fact, dim, "l_suppkey",
        "s_suppkey", expectedDimKeys = 1000L)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))

    // no false negatives: identical result sets
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)

    // the prefilter actually cuts the would-be shuffle: at 1% fpp the
    // kept fraction must approach the true match fraction (~1/7)
    val total = fact.count().toDouble
    val kept = BloomPrune.prefilter(fact, dim, "l_suppkey", "s_suppkey",
      expectedDimKeys = 1000L).count().toDouble
    val matched = plain.count().toDouble
    assert(kept >= matched, "bloom must never drop a matching row")
    assert(kept <= matched + 0.05 * total,
      s"prefilter too leaky: kept=$kept matched=$matched total=$total")
  }

  test("bloom prefiltered join is exact on STRING keys") {
    // build and probe hash through the same representation — string
    // keys must see zero false negatives just like long keys
    val dim = Tables(spark, sfDir, "nation").select(col("n_name"))
    val fact = Tables(spark, sfDir, "nation")
      .join(Tables(spark, sfDir, "customer"),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name").as("cust_nation"), col("c_custkey"))
      .where(pmod(col("c_custkey"), lit(3)) === 0)
    val dimOdd = dim.where(length(col("n_name")) % 2 === 1)
    val pruned = BloomPrune.prefilteredJoin(fact, dimOdd, "cust_nation",
        "n_name", expectedDimKeys = 50L)
      .select(col("c_custkey"), col("n_name"))
    val plain = fact.join(dimOdd, col("cust_nation") === col("n_name"))
      .select(col("c_custkey"), col("n_name"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(plain.count() > 0)
  }
}
