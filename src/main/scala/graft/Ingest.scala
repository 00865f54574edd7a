package graft

import org.apache.spark.sql.SparkSession

/** Live-endpoint dry run for the PubMed ingest — the ONE surface the
  * zero-egress harness can never exercise (the real NCBI E-utilities
  * interaction the reference drives in
  * spark-pubmed/job_pubmed_submit.py:31-56), packaged so a real
  * deployment's first HTTP exercise is a one-command dry run instead
  * of a production incident.
  *
  * What it runs is exactly the tested code: the `pubmed` DSv2 source
  * ([[graft.sources.PubMedSource]] — one input partition per
  * (year, month), sequential retstart paging, bounded-backoff retry
  * with the E-utilities failure taxonomy in
  * [[graft.sources.PubMedHttp]]), written back through the `pubmed`
  * sink (the reference's `{year}_{month}_num_{retstart}` object
  * naming) or as parquet. `IngestSpec` smoke-tests this main against
  * the same in-process HTTP server `PubMedHttpSpec` drives, so the
  * only untested delta on a real run is the network itself.
  *
  * Usage (NEVER run by the harness — egress is a deployment decision):
  * {{{
  *   sbt 'runMain graft.Ingest --live \
  *     --url https://eutils.ncbi.nlm.nih.gov/entrez/eutils/... \
  *     --beginYear 1999 --endYear 2000 --out /data/pubmed_pages \
  *     [--format parquet|pubmed] [--pageSize 10000]'
  * }}}
  *
  * `--live` is the egress gate: an `http(s)://` url without it fails
  * fast with this usage text. A file path as `--url` (the offline
  * page-blob transport) needs no flag — that is the smoke-test and
  * rehearsal vector. `endYear` is exclusive, matching the reference's
  * CLI contract ("1990 will load until 1989 only").
  */
object Ingest {

  /** Read the (year, month) page range from `url` and land it at
    * `out`; returns the page-row count. Factored from [[main]] so the
    * smoke test drives the exact production code path with an
    * in-process server url.
    */
  def run(spark: SparkSession, url: String, beginYear: Int, endYear: Int,
      out: String, format: String = "parquet",
      pageSize: Long = 10000L): Long = {
    val pages = spark.read.format("pubmed")
      .option("path", url)
      .option("beginYear", beginYear).option("endYear", endYear)
      .option("pageSize", pageSize)
      .load()
      // one materialized pass: the writer consumes every column, and
      // counting a separate scan would re-fetch every page from the
      // endpoint (the source is not a cache)
      .localCheckpoint(true)
    format match {
      case "pubmed" => // reference object naming, raw page blobs
        pages.write.format("pubmed").option("path", out)
          .mode("append").save()
      case "parquet" => // analytics-ready, partitioned for pruning
        pages.write.mode("overwrite").partitionBy("year", "month")
          .parquet(out)
      case other =>
        throw new IllegalArgumentException(
          s"--format must be parquet or pubmed, got $other")
    }
    pages.count()
  }

  private val usage =
    """usage: graft.Ingest [--live] --url <base-url-or-dir> \
      |  --beginYear <y> --endYear <y-exclusive> --out <dir> \
      |  [--format parquet|pubmed] [--pageSize n]
      |an http(s):// url REQUIRES --live (explicit egress opt-in; the
      |test harness never sets it)""".stripMargin

  def main(args: Array[String]): Unit = {
    val live = args.contains("--live")
    // --live is a bare flag: re-parse pairs without it so the sliding
    // window cannot misalign key/value pairs around it
    val paired = args.filterNot(_ == "--live").sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    def req(k: String): String = paired.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k\n$usage"))
    val url = req("--url")
    require(!url.matches("(?i)https?://.*") || live,
      s"refusing live HTTP ingest of $url without --live\n$usage")
    val spark = SparkSession.builder()
      .appName("graft-pubmed-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .getOrCreate()
    try {
      val n = run(spark, url, req("--beginYear").toInt,
        req("--endYear").toInt, req("--out"),
        paired.getOrElse("--format", "parquet"),
        paired.getOrElse("--pageSize", "10000").toLong)
      println(s"INGEST done: $n pages -> ${req("--out")}")
    } finally spark.stop()
  }
}
