package graft

import org.apache.spark.sql.functions._

import graft.pipeline.KeywordPipeline
import graft.sources.Articles

/** DSv2 PubMed source: month partitioning, reference file naming, and
  * the full ingest -> parse -> keyword flow end to end.
  */
class PubMedSourceSpec extends SparkSpec {

  private val fixtureDir =
    new java.io.File(getClass.getResource("/pubmed/1999_1_num_0").getPath)
      .getParent

  private def readSource =
    spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999")
      .option("endYear", "2000")
      .load()

  test("pubmed source plans one partition per month and reads pages") {
    val df = readSource
    assert(df.rdd.getNumPartitions == 12) // 1999 x 12 months
    val rows = df.collect()
    assert(rows.length == 1) // fixture has one page: 1999_1_num_0
    val r = rows.head
    assert(r.getInt(0) == 1999 && r.getInt(1) == 1 && r.getLong(2) == 0L)
    assert(r.getString(3).contains("Pubmed-entry"))
  }

  test("end year is exclusive (reference CLI contract)") {
    val df = spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999").option("endYear", "1999")
      .load()
    assert(df.count() == 0)
  }

  test("year/month filters prune input partitions at the source") {
    val wide = spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1990").option("endYear", "2010").load()
    // unfiltered: 20 years x 12 months
    assert(wide.rdd.getNumPartitions == 240)
    val pruned = wide.where(col("year") === 1999 && col("month") === 1)
    assert(pruned.rdd.getNumPartitions == 1)
    assert(pruned.count() == 1)
    val range = wide.where(col("year") >= 1998 && col("year") < 2000)
    assert(range.rdd.getNumPartitions == 24)
    // pushdown is visible in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || pruned.collect().nonEmpty)
  }

  test("reported (year, month) partitioning eliminates the aggregation exchange") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = spark.read.format("pubmed")
        .option("path", fixtureDir)
        .option("beginYear", "1999").option("endYear", "2001")
        .load()
        .groupBy("year", "month").agg(count(lit(1)).as("n"))
      agg.collect()
      val exchanges = agg.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges === 0,
        s"scan-reported KeyGroupedPartitioning should satisfy the " +
          s"group-by distribution:\n${agg.queryExecution.executedPlan}")
      // and the numbers are right
      val m = agg.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(m.values.forall(_ > 0) && m.keys.forall(_._1 >= 1999))
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("storage-partitioned join: two scans join on (year, month) shuffle-free") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      def scan = spark.read.format("pubmed")
        .option("path", fixtureDir)
        .option("beginYear", "1999").option("endYear", "2001")
        .load()
      // max() is NOT aggregate-pushable (only COUNT(*) is), so this
      // pins the ORIGINAL report-partitioning SPJ path — the pushed
      // COUNT path has its own test above
      val a = scan.groupBy("year", "month").agg(max("retstart").as("na"))
      val b = scan.groupBy("year", "month").agg(max("retstart").as("nb"))
      val joined = a.join(b, Seq("year", "month"))
      joined.collect()
      val exchanges = joined.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges === 0,
        s"both sides are key-grouped on (year, month):\n" +
          s"${joined.queryExecution.executedPlan}")
      assert(joined.where(col("na") =!= col("nb")).count() === 0)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("registered pubmed_page_stats: year pushdown prunes planned partitions") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = graft.queries.PubMedQueries.pubmedPageStats(spark, sfDir)
    assert(df.collect().nonEmpty)
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => flat(q.plan)
      case other => other +: other.children.flatMap(flat)
    }
    val scans = flat(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty, "the query must read through the pubmed DSv2 scan")
    // beginYear 1990, endYear 1994, WHERE year >= 1991: the pushed
    // filter must leave 3 years x 12 months, never 48 partitions
    assert(scans.head.inputRDD.getNumPartitions == 36,
      s"got ${scans.head.inputRDD.getNumPartitions} planned partitions")
  }

  test("COUNT(*) pushdown: page counts served from the listing") {
    def base = spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999").option("endYear", "2001")
      .load()
    val pushed = base.groupBy("year", "month").count()
    val viaRows = base.groupBy("year", "month")
      .agg(count(lit(1)).as("count"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val got = pushed.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == viaRows, s"pushed=$got rows=$viaRows")
    // the scan itself must output the aggregated shape (count column),
    // proving the aggregate reached the source
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => flat(q.plan)
      case other => other +: other.children.flatMap(flat)
    }
    val scan = flat(pushed.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b }
    assert(scan.nonEmpty &&
      scan.get.schema.fieldNames.exists(_.startsWith("count_")),
      s"scan schema ${scan.map(_.schema.fieldNames.toSeq)} — aggregate " +
        "not pushed")
    // group-by-year-only drops a partition key: partial counts from
    // the 12 monthly partitions must merge upstream to the same total
    val byYear = base.groupBy("year").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val wantByYear = viaRows.groupBy(_._1)
      .view.mapValues(_.map(_._3).sum).toSet
    assert(byYear == wantByYear, s"$byYear vs $wantByYear")
  }

  test("reported statistics: listing-exact rows/bytes, narrowed by pushdown") {
    import graft.sources.PubMedScanBuilder
    val pageBytes =
      new java.io.File(s"$fixtureDir/1999_1_num_0").length()
    // full schema, no pushdown: 12 planned months, 1 listed page blob
    val full = new PubMedScanBuilder(fixtureDir, 1999, 2000)
    val fs = full.build()
      .asInstanceOf[PubMedScanBuilder].estimateStatistics()
    assert(fs.numRows().getAsLong == 1L)
    // 16 fixed bytes (year+month ints, retstart long) + the blob
    assert(fs.sizeInBytes().getAsLong == 16L + pageBytes,
      s"got ${fs.sizeInBytes()}")
    // column pruning drops `content`: the blob bytes leave the estimate
    val pruned = new PubMedScanBuilder(fixtureDir, 1999, 2000)
    pruned.pruneColumns(org.apache.spark.sql.types.StructType(
      graft.sources.PubMedSource.schema.fields.filter(_.name != "content")))
    assert(pruned.estimateStatistics().sizeInBytes().getAsLong == 16L)
    // a pushed month filter that excludes the one blob zeroes the rows
    val out = new PubMedScanBuilder(fixtureDir, 1999, 2000)
    out.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("month", 2)))
    assert(out.estimateStatistics().numRows().getAsLong == 0L)
  }

  test("reported statistics describe the SCAN's output under partial pushdown") {
    // the r8 advisor findings: DSv2 Statistics must bound what the
    // scan EMITS, not what the operator above keeps. pushLimit is
    // partial (each partition emits up to l rows; GlobalLimit caps
    // above), and every grouping except exactly (year, month) is a
    // partial aggregation (one partial-count row per planned
    // partition). Five pages across two months, 12 planned months.
    import graft.sources.PubMedScanBuilder
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val dir = java.nio.file.Files.createTempDirectory("pubmed-stats").toFile
    try {
      val pages = Seq("1999_1_num_0", "1999_1_num_1", "1999_1_num_2",
        "1999_2_num_0", "1999_2_num_1")
      pages.foreach { n =>
        java.nio.file.Files.write(new java.io.File(dir, n).toPath,
          "Pubmed-entry ::= {}".getBytes)
      }
      // partial limit: 5 listed pages, limit 1 over 12 partitions —
      // the scan can emit up to min(5, 1*12) = 5 rows (the old
      // min(pages, l) = 1 under-estimated by the partition count)
      val lim = new PubMedScanBuilder(dir.getPath, 1999, 2000)
      assert(lim.pushLimit(1))
      assert(lim.estimateStatistics().numRows().getAsLong == 5L)
      // partial aggregation (year-only grouping): each of the 12
      // planned partitions emits one partial-count row, so the scan
      // outputs 12 rows — not the 1 distinct year
      def agg(groups: String*) = new Aggregation(
        Array(new CountStar),
        groups.toArray.map(g =>
          Expressions.column(g)
            : org.apache.spark.sql.connector.expressions.Expression))
      val byYear = new PubMedScanBuilder(dir.getPath, 1999, 2000)
      assert(byYear.pushAggregation(agg("year")))
      assert(byYear.estimateStatistics().numRows().getAsLong == 12L)
      val global = new PubMedScanBuilder(dir.getPath, 1999, 2000)
      assert(global.pushAggregation(agg()))
      assert(global.estimateStatistics().numRows().getAsLong == 12L)
      // complete pushdown (year, month): distinct groups == planned
      // partitions, so the two readings coincide at 12
      val complete = new PubMedScanBuilder(dir.getPath, 1999, 2000)
      assert(complete.pushAggregation(agg("year", "month")))
      assert(complete.estimateStatistics().numRows().getAsLong == 12L)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("reported statistics let the planner broadcast a pruned scan") {
    // pre-stats, a DSv2 scan with no SupportsReportStatistics reports
    // spark.sql.defaultSizeInBytes (Long.MaxValue): joined against a
    // big fact frame it could NEVER be the static broadcast side. With
    // listing-derived stats the one-page scan is a few hundred bytes
    // and the planner broadcasts it up front — no exchange of the big
    // side, no waiting for AQE to discover the size at runtime.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // make the other side comfortably above autoBroadcastJoinThreshold
    // estimates so the pubmed side is the only broadcastable one
    val fact = spark.range(4000000).select(
      (col("id") % 2 + 1999).cast("int").as("year"),
      col("id").as("payload"))
    val joined = readSource.select("year", "month", "retstart")
      .join(fact, Seq("year"))
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => flat(q.plan)
      case other => other +: other.children.flatMap(flat)
    }
    val nodes = flat(joined.queryExecution.executedPlan)
    val bhj = nodes.collectFirst { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty,
      s"expected a broadcast-hash join of the stats-reported scan; plan:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
    val buildChild = bhj.get.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
        bhj.get.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
        bhj.get.right
    }
    assert(flat(buildChild).exists(_.isInstanceOf[BatchScanExec]),
      "the pubmed scan must be the BUILD side of the broadcast join")
  }

  test("runtime filtering: a dim join prunes fetch partitions at execution") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import spark.implicits._
    // the DPP planner wants a REAL Filter node on the build side (a
    // pre-folded LocalRelation does not count as selective)
    val dim = spark.range(1990, 2010)
      .select(col("id").cast("int").as("y"))
      .where(col("y") === 1999)
    val fact = spark.read.format("pubmed")
      .option("path", fixtureDir)
      .option("beginYear", "1999").option("endYear", "2001")
      .load()
    val joined = fact.join(broadcast(dim), fact("year") === dim("y"))
      .select("year", "month", "retstart")
    val rows = joined.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(0) == 1999))
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => flat(q.plan)
      case other => other +: other.children.flatMap(flat)
    }
    val scan = flat(joined.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b }.get
    // statically 24 (year, month) partitions are in range; the runtime
    // year-set {1999} must prune to 12 BEFORE any page listing/fetch
    assert(scan.inputRDD.getNumPartitions == 12,
      s"got ${scan.inputRDD.getNumPartitions} partitions — runtime " +
        s"filter not applied\n${joined.queryExecution.executedPlan}")
  }

  test("column pruning skips the content fetch") {
    val counted = readSource.select("year", "retstart")
    val rows = counted.collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 1999)
    assert(counted.schema.fieldNames.toSeq == Seq("year", "retstart"))
  }

  test("ingest -> asn1 parse -> keywords reproduces the golden output") {
    import spark.implicits._
    val pages = readSource.select(col("content")).as[String]
    val articles = pages.flatMap(graft.sources.Asn1.articles(_))
      .toDF("pmid", "abstract")
      .where(col("abstract").isNotNull)
    val words = KeywordPipeline.invertedIndexV1(articles, "pmid", "abstract")
      .where(col("pmid") === 123456L)
      .collect().map(_.getString(0)).toSet
    assert(words == Set("article", "review", "different", "publication",
      "breast", "cancer", "man"))
  }

  test("asn1 file source joins with ndjson output consistently") {
    val fromAsn1 = Articles.readAsn1(spark, s"$fixtureDir/1999_1_num_0")
    assert(fromAsn1.where(col("abstract").isNotNull).count() == 2)
  }

  test("dsv2 write path lands page blobs with reference naming, roundtrips") {
    import spark.implicits._
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-pubmed-write").toString
    val pages = Seq(
      (1999, 1, 0L, "page one"),
      (1999, 1, 10000L, "page two"),
      (2000, 3, 0L, "page three"))
    pages.toDF("year", "month", "retstart", "content")
      .write.format("pubmed").option("path", outDir)
      .mode("append").save()

    // reference object naming, no stray tmp files after commit
    val names = new java.io.File(outDir).listFiles().map(_.getName).toSet
    assert(names == Set("1999_1_num_0", "1999_1_num_10000", "2000_3_num_0"),
      names.mkString(","))

    // roundtrip through the read path
    val back = spark.read.format("pubmed")
      .option("path", outDir)
      .option("beginYear", "1999").option("endYear", "2001")
      .load()
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(back == pages.toSet)

    // overwrite-by-name: re-writing a page replaces its content
    Seq((1999, 1, 0L, "page one v2"))
      .toDF("year", "month", "retstart", "content")
      .write.format("pubmed").option("path", outDir)
      .mode("append").save()
    val v2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "1999_1_num_0")))
    assert(v2 == "page one v2")
    assert(new java.io.File(outDir).listFiles().length == 3)
  }

  test("end-to-end incremental ingest: pages -> parse -> keywords -> upsert") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-e2e-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-e2e-ckpt").toString
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft-e2e-sink").toString + "/keywords"

    def writePage(name: String, pmid: Long, abstractText: String): Unit = {
      val content =
        s"""Pubmed-entry ::= {
           |  pmid $pmid ,
           |  medent {
           |    em std { year 1999 , month 1 } ,
           |    abstract "$abstractText" ,
           |    status ok
           |  }
           |}""".stripMargin
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name), content.getBytes)
    }

    val parse = udf((c: String) =>
      graft.sources.Asn1.articles(c).map(a => (a.pmid, a.abstractText.orNull)))

    def runOnce(): Unit = {
      val stream = spark.readStream.format("pubmed")
        .option("path", srcDir)
        .option("beginYear", "1999").option("endYear", "2001")
        .load()
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val words = batch
            .select(col("year"), explode(parse(col("content"))).as("a"))
            .select(col("year"), col("a._2").as("abs"))
            .where(col("abs").isNotNull)
            .select(col("year"),
              explode(KeywordPipeline.keywordsV1(col("abs"))).as("word"))
            .groupBy("year", "word").agg(count(lit(1)).as("cnt"))
          graft.sources.Sinks.upsertPartitions(words, sinkDir, Seq("year"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: the golden abstract (README v1 keyword set)
    writePage("1999_1_num_0", 123456L,
      "This article is a review of the different publications on breast cancer in men.")
    runOnce()
    val y1999 = spark.read.parquet(sinkDir).where(col("year") === 1999)
      .select("word").collect().map(_.getString(0)).toSet
    assert(y1999 == Set("article", "review", "different", "publication",
      "breast", "cancer", "man"))
    val files1999 = new java.io.File(s"$sinkDir/year=1999")
      .listFiles().map(_.getName).toSet

    // batch 2: a new year's page lands; the resumed stream processes
    // ONLY it, and the 1999 partition's files are untouched
    writePage("2000_2_num_0", 777L, "Spark engines process queries.")
    runOnce()
    assert(new java.io.File(s"$sinkDir/year=1999")
      .listFiles().map(_.getName).toSet == files1999)
    val y2000 = spark.read.parquet(sinkDir).where(col("year") === 2000)
      .select("word").collect().map(_.getString(0)).toSet
    assert(y2000 == Set("spark", "engine", "process", "query"))
  }

  test("streaming pubmed source resumes from checkpointed page offsets") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-pubmed-stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pubmed-ckpt").toString
    def page(name: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name),
        s"stub page $name".getBytes)

    page("1999_1_num_0"); page("1999_1_num_10000"); page("1999_2_num_0")

    def run(): Seq[(Int, Int, Long)] = {
      // memory sink cannot resume from a checkpoint; foreachBatch can
      // (runs on the driver, one batch at a time — no sync needed)
      val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
      val stream = spark.readStream.format("pubmed")
        .option("path", srcDir)
        .option("beginYear", "1999").option("endYear", "2001")
        .load()
      val q = stream.select("year", "month", "retstart").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          got ++= batch.collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.toSeq
    }

    val first = run()
    assert(first.toSet == Set((1999, 1, 0L), (1999, 1, 10000L), (1999, 2, 0L)))

    // new pages land; a resumed query must read ONLY the unseen tail
    page("1999_2_num_10000"); page("2000_1_num_0")
    val second = run()
    assert(second.toSet == Set((1999, 2, 10000L), (2000, 1, 0L)),
      s"resume re-read or missed pages: ${second.mkString(",")}")
  }

  test("limit pushdown caps each partition's page walk") {
    import graft.sources.{PubMedMonthPartition, PubMedMonthReader}
    val dir = java.nio.file.Files.createTempDirectory("pubmed-limit")
    def page(n: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(n), "Pubmed-entry ::= {}")
    (0 until 4).foreach(i => page(s"1999_1_num_${i * 10000}"))
    (0 until 4).foreach(i => page(s"1999_2_num_${i * 10000}"))

    // builder accepts the limit (partial contract) but refuses it when
    // an aggregation is already pushed
    val b = new graft.sources.PubMedScanBuilder(dir.toString, 1999, 2000)
    assert(b.pushLimit(2) && b.isPartiallyPushed())

    // per-partition reader stops after `limit` rows — the listing walk
    // (and with content read, the page fetches) never pass the cap
    val p = PubMedMonthPartition(1999, 1, dir.toString,
      Array("year", "month", "retstart"), limit = Some(2))
    val r = new PubMedMonthReader(p)
    var n = 0
    while (r.next()) n += 1
    assert(n == 2, s"reader must stop at the pushed limit, emitted $n")

    // end to end: LIMIT over the source returns exactly that many rows
    val got = spark.read.format("pubmed")
      .option("path", dir.toString)
      .option("beginYear", "1999").option("endYear", "2000")
      .load().select("year", "month", "retstart").limit(3).collect()
    assert(got.length == 3)
  }
}
