package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's paged PubMed ingest (SURVEY.md §2.1
  * O1/O2/O4/O5): one input partition per (year, month), each reading the
  * month's 10k-record pages with bounded retry — the fetch stage as a
  * *source returning rows* instead of the reference's foreach side-effect
  * (driver-serial esearch loop + unbounded retry,
  * spark-pubmed/job_pubmed_submit.py:31-79).
  *
  * The page fetcher is pluggable for the zero-egress harness: `path`
  * points at a directory of page blobs named
  * `{year}_{month}_num_{retstart}` (the reference's GCS object naming,
  * job_pubmed_submit.py:40). An HTTP fetcher would slot into
  * [[PubMedMonthReader.fetchPage]] with the same bounded-backoff loop.
  *
  * Usage: spark.read.format("pubmed").option("path", dir)
  *   .option("beginYear", 1999).option("endYear", 2000).load()
  */
class PubMedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pubmed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PubMedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PubMedTable(properties.asScala.toMap)
}

object PubMedSource {
  val schema: StructType = StructType(Seq(
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("retstart", LongType, nullable = false),
    StructField("content", StringType)))
}

class PubMedTable(props: Map[String, String]) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"pubmed(${props.getOrElse("path", "")})"
  override def schema(): StructType = PubMedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PubMedScanBuilder(
      options.getOrDefault("path", props.getOrElse("path", "")),
      options.getOrDefault("beginYear", props.getOrElse("beginYear", "1990")).toInt,
      options.getOrDefault("endYear", props.getOrElse("endYear", "1991")).toInt,
      options.getOrDefault("pageSize", props.getOrElse("pageSize", "10000")).toLong)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PubMedWriteBuilder(
      info.options().getOrDefault("path", props.getOrElse("path", "")),
      info.schema())
}

/** endYear is exclusive, matching the reference's CLI contract
  * ("1990 will load until 1989 only", spark-pubmed-word-count/README.md).
  *
  * Pushdown surface (what `.explain` shows as PushedFilters/ReadSchema):
  *  - year/month comparisons prune (year, month) INPUT PARTITIONS — a
  *    `WHERE year = 1999` never even plans the other years' fetches,
  *    the source-level analogue of parquet partition pruning. Pushed
  *    filters are exact, so Spark drops its re-evaluation Filter node.
  *  - column pruning: a query that never reads `content` (e.g. a page
  *    count) skips the page download entirely — the reader materializes
  *    only the requested fields.
  */
class PubMedScanBuilder(path: String, beginYear: Int, endYear: Int,
    pageSize: Long = 10000L)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsReportPartitioning
    with SupportsRuntimeFiltering with SupportsPushDownLimit
    with SupportsReportStatistics {

  private var yearLo = beginYear
  private var yearHi = endYear // exclusive
  private var monthEq: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PubMedSource.schema
  // COUNT(*) pushdown: group columns (subset of year/month) when a
  // page-count aggregation was pushed into the scan
  private var aggGroupCols: Option[Seq[String]] = None

  /** COUNT(*) grouped by (a subset of) the partition keys is answered
    * from the page LISTING — one row per planned partition, no page
    * fetch, no per-page rows. Partial pushdown contract
    * (supportCompletePushDown=false): the scan emits per-partition
    * partial counts and Spark SUMs them, which also makes a
    * group-by-year-only pushdown correct (its 12 monthly partials
    * merge upstream).
    */
  /** Grouping by EXACTLY (year, month) is complete at the source: each
    * group maps to one planned partition, so the one row it emits is
    * the final count — Spark plans NO re-aggregation (and the
    * KeyGroupedPartitioning report keeps downstream joins on the
    * ingest keys exchange-free). Any other accepted grouping stays
    * partial: Spark sums the per-partition counts.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = {
    val cols = aggregation.groupByExpressions.collect {
      case f: NamedReference if f.fieldNames.length == 1 =>
        f.fieldNames()(0)
    }
    cols.toSet == Set("year", "month") &&
      aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar])
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groupsOk = aggregation.groupByExpressions.forall {
      case f: NamedReference =>
        f.fieldNames.length == 1 &&
          (f.fieldNames()(0) == "year" || f.fieldNames()(0) == "month")
      case _ => false
    }
    val aggsOk = aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    if (!groupsOk || !aggsOk) return false
    val cols = aggregation.groupByExpressions.toSeq
      .map(_.asInstanceOf[NamedReference].fieldNames()(0))
    aggGroupCols = Some(cols)
    required = StructType(
      cols.map(c => StructField(c, IntegerType, nullable = false)) ++
        aggregation.aggregateExpressions.indices
          .map(i => StructField(s"count_$i", LongType, nullable = false)))
    true
  }

  // runtime (dynamic-partition-pruning) key sets, delivered at
  // EXECUTION time from the completed build side of a join
  private var runtimeYears: Option[Set[Int]] = None
  private var runtimeMonths: Option[Set[Int]] = None

  /** Runtime filtering (the DSv2 form of dynamic partition pruning):
    * a join on year/month against a small dimension delivers the
    * dimension's key SET after its side executes, and the scan
    * re-plans — months outside the set never even list their pages,
    * the same fetch-avoidance static pushdown gives, but driven by
    * DATA instead of literals.
    */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("year"), Expressions.column("month"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("year", vs) =>
      runtimeYears = Some(vs.collect { case i: Int => i }.toSet)
    case EqualTo("year", y: Int) => runtimeYears = Some(Set(y))
    case org.apache.spark.sql.sources.In("month", vs) =>
      runtimeMonths = Some(vs.collect { case i: Int => i }.toSet)
    case EqualTo("month", m: Int) => runtimeMonths = Some(Set(m))
    case _ => () // unsupported runtime filters are simply not applied
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("year", _: Int) | GreaterThan("year", _: Int) |
           GreaterThanOrEqual("year", _: Int) | LessThan("year", _: Int) |
           LessThanOrEqual("year", _: Int) | EqualTo("month", _: Int) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("year", y: Int) =>
        yearLo = math.max(yearLo, y); yearHi = math.min(yearHi, y + 1)
      case GreaterThan("year", y: Int) => yearLo = math.max(yearLo, y + 1)
      case GreaterThanOrEqual("year", y: Int) => yearLo = math.max(yearLo, y)
      case LessThan("year", y: Int) => yearHi = math.min(yearHi, y)
      case LessThanOrEqual("year", y: Int) => yearHi = math.min(yearHi, y + 1)
      case EqualTo("month", m: Int) => monthEq = Some(m)
      case _ => ()
    }
    pushed = accepted
    rejected // only these need Spark-side re-evaluation
  }
  override def pushedFilters(): Array[Filter] = pushed

  // LIMIT pushdown: each partition reader stops after `limit` rows --
  // for the file transport that caps the listing walk, for http it
  // caps the page probes (and so the fetches). PARTIAL contract
  // (isPartiallyPushed): Spark still applies the global limit above,
  // this only stops partitions from reading past what any global
  // result could use. Not combined with a pushed aggregation: a
  // partial count limited per partition would drop partials.
  private var limitPushed: Option[Int] = None
  override def pushLimit(l: Int): Boolean = {
    if (aggGroupCols.nonEmpty) false
    else { limitPushed = Some(l); true }
  }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PubMedMicroBatchStream(path, yearLo, yearHi, monthEq,
      required.fieldNames)
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      year <- yearLo until yearHi
      if runtimeYears.forall(_.contains(year))
      month <- 1 to 12
      if monthEq.forall(_ == month) && runtimeMonths.forall(_.contains(month))
    } yield PubMedMonthPartition(year, month, path,
        required.fieldNames, pageSize, aggGroupCols,
        limitPushed): InputPartition).toArray

  /** One planned partition per (year, month): reported as
    * KeyGroupedPartitioning so downstream clustering requirements on
    * the ingest keys are already satisfied at the scan. With a pushed
    * aggregation that dropped one of the keys from the output, the
    * grouping no longer holds — report Unknown.
    */
  override def outputPartitioning(): Partitioning = {
    val keysPresent = aggGroupCols match {
      case None => true
      case Some(cols) => cols.toSet == Set("year", "month")
    }
    if (keysPresent)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("year"), Expressions.identity("month")),
        planInputPartitions().length)
    else new UnknownPartitioning(planInputPartitions().length)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PubMedMonthReader(p.asInstanceOf[PubMedMonthPartition])
    }

  /** DSv2 statistics AFTER pushdown (the one v2 read mixin this source
    * still lacked): without it Spark's V2 relation falls back to
    * `spark.sql.defaultSizeInBytes` (Long.MaxValue) and a pushed-down
    * one-month scan still plans like an unbounded table — CBO never
    * broadcasts it and AQE only recovers after a full exchange. For
    * the file transport the page LISTING is the exact row count (one
    * row per page blob) and the blob lengths are the content bytes,
    * both driver-cheap and both already narrowed by every pushed
    * filter/runtime-prune (the estimate reflects what
    * planInputPartitions will actually plan). Column pruning scales
    * the size: a scan that never reads `content` reports only the
    * fixed-width key columns. A pushed COUNT(*) aggregation emits one
    * row per group from the listing, and the http transport reports
    * empty (unknown beats wrong — Spark keeps its defaults).
    */
  override def estimateStatistics(): Statistics = {
    val isHttp = path.startsWith("http://") || path.startsWith("https://")
    if (isHttp) return new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.empty()
      override def numRows(): util.OptionalLong = util.OptionalLong.empty()
    }
    val keys = planInputPartitions()
      .map(_.asInstanceOf[PubMedMonthPartition])
      .map(p => (p.year, p.month)).toSet
    val re = raw"(\d+)_(\d+)_num_(\d+)".r
    val pageLens = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap { f =>
        f.getName match {
          case re(y, m, _) if keys.contains((y.toInt, m.toInt)) =>
            Some(f.length())
          case _ => None
        }
      }
    // fixed-width output columns: year/month ints + retstart long (+
    // count_i longs for a pushed aggregation); `content` adds the
    // listed blob bytes only when the projection actually reads it
    val fixedWidth = required.fields.map(_.dataType match {
      case IntegerType => 4L
      case LongType => 8L
      case _ => 0L
    }).sum
    val (rows, bytes) = aggGroupCols match {
      case Some(_) =>
        // DSv2 Statistics describe the SCAN's output. Only the exact
        // (year, month) grouping is a complete pushdown; every other
        // accepted grouping (year-only, month-only, global COUNT(*))
        // is partial, where each planned partition emits one partial
        // count row that Spark's agg above merges — so the scan
        // outputs keys.size rows in all cases (for the complete
        // grouping, distinct groups and planned partitions coincide).
        val n = keys.size.toLong
        (n, n * fixedWidth)
      case None =>
        val n = limitPushed match {
          case Some(l) =>
            // pushLimit is declared PARTIAL (isPartiallyPushed): each
            // partition emits up to l rows and the GlobalLimit node
            // above does the final cap, so the scan's own output
            // bound is l per planned partition
            math.min(pageLens.length.toLong, l.toLong * keys.size)
          case None => pageLens.length.toLong
        }
        val content =
          if (required.fieldNames.contains("content")) pageLens.sum else 0L
        (n, n * fixedWidth +
          (if (pageLens.isEmpty) 0L
           else content * n / math.max(pageLens.length.toLong, 1L)))
    }
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }
}

case class PubMedMonthPartition(year: Int, month: Int, path: String,
    columns: Array[String], pageSize: Long = 10000L,
    aggGroupCols: Option[Seq[String]] = None,
    limit: Option[Int] = None)
    extends InputPartition with HasPartitionKey {
  // the partition IS keyed by (year, month) — reporting it lets Spark
  // group-aggregate or storage-partition-join on those keys with NO
  // exchange (spark.sql.sources.v2.bucketing.enabled)
  override def partitionKey(): InternalRow = InternalRow(year, month)
}

/** Streaming micro-batch ingest over the same page-blob layout: the
  * incremental form of the reference's "skip what already exists"
  * re-run loop (job_pubmed_submit.py:40-43), with REAL checkpointed
  * offsets instead of remote exists-probes.
  *
  * Offset model: the page listing sorted by (year, month, retstart)
  * is the log; an offset is an index into it. Page blobs are immutable
  * and the reference's ingest appends them in (year, month, page)
  * order, so the sorted prefix below a committed offset never changes
  * — the same monotone-append assumption Spark's own file source
  * makes, without its seen-file map (the naming IS the log here).
  * Each micro-batch plans one partition per (year, month) it touches,
  * so fetch parallelism matches the batch path.
  */
class PubMedMicroBatchStream(path: String, yearLo: Int, yearHi: Int,
    monthEq: Option[Int], columns: Array[String]) extends MicroBatchStream {

  private def listSorted(): Array[(Int, Int, Long, String)] = {
    val dir = new java.io.File(path)
    val re = raw"(\d+)_(\d+)_num_(\d+)".r
    Option(dir.listFiles()).getOrElse(Array.empty).flatMap { f =>
      f.getName match {
        case re(y, m, r) =>
          val (yi, mi) = (y.toInt, m.toInt)
          if (yi >= yearLo && yi < yearHi && monthEq.forall(_ == mi))
            Some((yi, mi, r.toLong, f.getAbsolutePath))
          else None
        case _ => None
      }
    }.sortBy(t => (t._1, t._2, t._3))
  }

  override def initialOffset(): Offset = PubMedOffset(0)
  override def latestOffset(): Offset = PubMedOffset(listSorted().length)
  override def deserializeOffset(json: String): Offset =
    PubMedOffset(json.replaceAll("[^0-9]", "").toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PubMedOffset].idx.toInt
    val e = end.asInstanceOf[PubMedOffset].idx.toInt
    listSorted().slice(s, e)
      .groupBy(t => (t._1, t._2)).toArray.sortBy(_._1)
      .map { case (_, files) =>
        PubMedFilesPartition(files.toSeq, columns): InputPartition
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PubMedFilesReader(p.asInstanceOf[PubMedFilesPartition])
    }
}

case class PubMedOffset(idx: Long) extends Offset {
  override def json(): String = s"""{"idx":$idx}"""
}

case class PubMedFilesPartition(files: Seq[(Int, Int, Long, String)],
  columns: Array[String]) extends InputPartition

/** Reads an explicit page-file list (streaming path). */
class PubMedFilesReader(p: PubMedFilesPartition)
    extends PartitionReader[InternalRow] {
  private val it = p.files.iterator
  private var current: InternalRow = _
  override def next(): Boolean =
    if (!it.hasNext) false
    else {
      val (y, m, retstart, filePath) = it.next()
      current = InternalRow.fromSeq(p.columns.toSeq.map {
        case "year" => y
        case "month" => m
        case "retstart" => retstart
        case "content" => UTF8String.fromString(
          PubMedFilesReader.fetchPage(new java.io.File(filePath)))
      })
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object PubMedFilesReader {

  /** Bounded exponential backoff (shared [[Retry.withBackoff]] loop —
    * one retry implementation for the file AND http fetchers; D6 fix
    * vs the reference's unbounded retry). Exhaustion rethrows the raw
    * IOException (harness contract, unchanged).
    */
  def fetchPage(f: java.io.File): String =
    Retry.withBackoff(maxAttempts = 4, initialDelayMs = 250) { () =>
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
    }
}

/** Reads one month's pages. Bounded exponential backoff replaces the
  * reference's `while True: sleep(3)` (job_pubmed_submit.py:47-51, D6).
  *
  * Two transports behind one row contract, chosen by the path scheme:
  *  - directory path: list `{year}_{month}_num_{retstart}` blobs (the
  *    zero-egress harness default);
  *  - `http(s)://base`: SEQUENTIAL retstart paging — GET
  *    `base/{year}_{month}_num_{retstart}` for retstart 0, pageSize,
  *    2*pageSize, ... until the server 404s (the reference pages
  *    efetch by retstart+retmax the same way, job_pubmed_submit.py:
  *    35-40; retmax=10000 is its page size). Each GET runs the shared
  *    bounded-backoff loop with the NCBI failure taxonomy
  *    ([[PubMedHttp.fetchPage]]); a 404 is the terminal no-more-pages
  *    signal, never retried.
  */
class PubMedMonthReader(p: PubMedMonthPartition)
    extends PartitionReader[InternalRow] {

  private val isHttp =
    p.path.startsWith("http://") || p.path.startsWith("https://")
  private var current: InternalRow = _

  private def row(retstart: Long, content: () => String): InternalRow =
    // materialize only the pruned columns; for the file transport the
    // page fetch is skipped unless `content` was requested
    InternalRow.fromSeq(p.columns.toSeq.map {
      case "year" => p.year
      case "month" => p.month
      case "retstart" => retstart
      case "content" => UTF8String.fromString(content())
    })

  // ---- file transport ----
  private lazy val filePages: Iterator[java.io.File] = {
    val dir = new java.io.File(p.path)
    val prefix = s"${p.year}_${p.month}_num_"
    Option(dir.listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith(prefix))
      .sortBy(f => f.getName.stripPrefix(prefix).toLongOption.getOrElse(0L))
      .iterator
  }

  // ---- http transport: probe-ahead pager ----
  private var nextRetstart = 0L
  private def fetchHttp(retstart: Long): Option[String] =
    try Some(PubMedHttp.fetchPage(
      s"${p.path.stripSuffix("/")}/${p.year}_${p.month}_num_$retstart"))
    catch { case _: PubMedHttp.PageMissing => None }

  // pushed COUNT(*): one output row per partition, counted from the
  // listing (file) or the 404-terminated probe sequence (http) — the
  // page bodies are never materialized
  private var aggEmitted = false
  private def countPages(): Long =
    if (!isHttp) filePages.length.toLong
    else {
      var n = 0L
      while (fetchHttp(nextRetstart).isDefined) {
        n += 1; nextRetstart += p.pageSize
      }
      n
    }

  override def next(): Boolean = p.aggGroupCols match {
    case Some(cols) =>
      if (aggEmitted) false
      else {
        aggEmitted = true
        val n = countPages()
        // GROUP BY semantics: an empty month is NOT a zero-count group
        if (n == 0L) false
        else {
          current = InternalRow.fromSeq(
            cols.map {
              case "year" => p.year
              case "month" => p.month
            } ++ p.columns.toSeq.drop(cols.length).map(_ => n))
          true
        }
      }
    case None =>
      if (p.limit.exists(emitted >= _)) false
      else if (isHttp) {
        fetchHttp(nextRetstart) match {
          case Some(body) =>
            current = row(nextRetstart, () => body)
            nextRetstart += p.pageSize
            emitted += 1
            true
          case None => false
        }
      } else if (!filePages.hasNext) false
      else {
        val f = filePages.next()
        val retstart = f.getName.stripPrefix(s"${p.year}_${p.month}_num_")
          .toLongOption.getOrElse(0L)
        current = row(retstart, () => PubMedFilesReader.fetchPage(f))
        emitted += 1
        true
      }
  }

  private var emitted = 0

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** DSv2 write path: a DataFrame of (year, month, retstart, content)
  * lands as page blobs under the reference's `{year}_{month}_num_
  * {retstart}` naming — the sink twin of the batch/streaming read
  * paths, with REAL two-phase commit:
  *
  *  - each task writes `.tmp.{task}.{epoch}`-suffixed files and
  *    reports them in its commit message;
  *  - the driver's commit() renames tmp -> final (idempotent: a blob
  *    name writes the same logical page, last rename wins, matching
  *    the reference's overwrite-by-name object semantics);
  *  - abort() deletes the orphaned tmps, so failed jobs leave no
  *    partial pages for the streaming reader's offset log to trip on.
  */
class PubMedWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder {
  require(path.nonEmpty, "pubmed write requires option(\"path\", ...)")
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new PubMedBatchWrite(path, schema)
  }
}

class PubMedBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PubMedDataWriterFactory(path, schema.fieldNames)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case PubMedCommit(files) =>
        files.foreach { case (tmp, fin) =>
          val t = new java.io.File(tmp)
          val f = new java.io.File(fin)
          if (f.exists()) f.delete() // overwrite-by-name
          if (!t.renameTo(f))
            throw new java.io.IOException(s"commit rename failed: $tmp -> $fin")
        }
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case PubMedCommit(files) =>
        files.foreach { case (tmp, _) => new java.io.File(tmp).delete() }
      case _ => ()
    }
}

case class PubMedCommit(files: Seq[(String, String)])
  extends WriterCommitMessage

class PubMedDataWriterFactory(path: String, columns: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PubMedDataWriter(path, columns, taskId)
}

class PubMedDataWriter(path: String, columns: Array[String], taskId: Long)
    extends DataWriter[InternalRow] {
  private val idx = columns.zipWithIndex.toMap
  private val written = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  override def write(row: InternalRow): Unit = {
    val year = row.getInt(idx("year"))
    val month = row.getInt(idx("month"))
    val retstart = row.getLong(idx("retstart"))
    val content =
      if (idx.contains("content") && !row.isNullAt(idx("content")))
        row.getUTF8String(idx("content")).toString
      else ""
    val fin = new java.io.File(path, s"${year}_${month}_num_$retstart")
    val tmp = new java.io.File(path, s"${fin.getName}.tmp.$taskId")
    java.nio.file.Files.createDirectories(tmp.toPath.getParent)
    java.nio.file.Files.write(tmp.toPath,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    written += ((tmp.getAbsolutePath, fin.getAbsolutePath))
  }

  override def commit(): WriterCommitMessage = PubMedCommit(written.toSeq)
  override def abort(): Unit =
    written.foreach { case (tmp, _) => new java.io.File(tmp).delete() }
  override def close(): Unit = ()
}
