package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape regression guards for flagship queries: the properties
  * the scaling story depends on (pushdown reaching the scan, broadcast
  * dimension joins, top-k as TakeOrdered, single-scan operators) are
  * pinned so a refactor that silently loses one fails CI, not the
  * 100 TB run.
  */
class PlanGuardSpec extends SparkSpec {

  /** Finalized AQE plan flattened through stage boundaries; stops at
    * ReusedExchange so shared subtrees are not double-counted.
    */
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // finalize AQE on THIS df's execution
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case r: ReusedExchangeExec => Seq(r)
      case _ => p +: p.children.flatMap(flat)
    }
    flat(df.queryExecution.executedPlan)
  }

  test("join_local_supplier: date filter pushed to scan, dims broadcast") {
    val ns = nodes(graft.queries.Relational.joinLocalSupplier(spark, sfDir))
    val orderScan = ns.collect { case s: FileSourceScanExec
      if s.metadata.getOrElse("Location", "").contains("orders") => s }
    assert(orderScan.nonEmpty &&
      orderScan.head.metadata("PushedFilters").contains("GreaterThanOrEqual(o_orderdate"),
      "o_orderdate filter must reach the orders parquet scan")
    assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 4,
      "dimension joins must broadcast at this SF")
  }

  test("text_keyword_topk: top-100 runs as TakeOrdered, scan reads only text") {
    val ns = nodes(graft.queries.TextQueries.keywordTopK(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "limit+sort must not materialize a global sort")
    val scan = ns.collect { case s: FileSourceScanExec => s }
    assert(scan.nonEmpty &&
      scan.forall(_.requiredSchema.fieldNames.sameElements(Array("text"))),
      "scan must prune to the text column")
  }

  test("dedup_chunk_level: exactly one corpus scan") {
    val ns = nodes(graft.queries.DedupQueries.chunkLevel(spark, sfDir))
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) === 1,
      "window election must not re-read the corpus")
  }

  test("agg_pricing_summary: partial+final hash aggregation pair") {
    val ns = nodes(graft.queries.Relational.aggPricingSummary(spark, sfDir))
    assert(ns.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      "aggregation must combine map-side")
  }

  test("sort_top_orders: TakeOrdered, never a global Sort+Limit") {
    val ns = nodes(graft.queries.Relational.sortTopOrders(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[TakeOrderedAndProjectExec]))
  }

  test("pii redaction: scan-speed projection, no exchange") {
    import org.apache.spark.sql.functions._
    // the operator itself (without the query's presentation orderBy):
    // redaction must be a single codegen'd scan->project, no shuffle
    val df = Tables(spark, sfDir, "documents").select(
      col("doc_id"), graft.text.Redact.redact(col("text")).as("r"))
    val ns = nodes(df)
    assert(!ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "redaction must not shuffle")
    assert(ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      "redaction must stay inside whole-stage codegen")
  }

  test("bm25: corpus scanned at most twice, small sides broadcast") {
    val df = graft.queries.TextQueries.bm25TopK(spark, sfDir)
    val ns = nodes(df)
    // tf is checkpointed and reused; only the tf pass and the corpus
    // stats pass may touch the documents parquet
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) <= 2,
      "bm25 must not re-tokenize the corpus per consumer")
    assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1,
      "df table must broadcast, never shuffle the tf side")
  }

  test("stats_profile: one scan feeds every profiling aggregate") {
    val ns = nodes(graft.queries.StatsExtra.profileTable(spark, sfDir))
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) === 1,
      "profiling must be single-pass")
  }

  test("emb_centroid: partial+final agg, vectors never shuffle") {
    val ns = nodes(graft.queries.SimilarityQueries.embCentroid(spark, sfDir))
    assert(ns.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      "centroid sums must combine map-side")
    val ex = ns.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(ex.forall(e => !e.child.schema.fieldNames.contains("embedding")),
      "no exchange may carry the raw embedding column")
  }

  test("stats_quantile_bins: no corpus-wide partition-less window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    val ns = nodes(graft.queries.StatsExtra.quantileBins(spark, sfDir))
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    // a partition-less window is only acceptable over a PRE-AGGREGATED
    // (bucket-count-sized) input: walking down from the window must hit
    // an aggregation before any file scan
    def scanBelowWithoutAgg(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => false
      case _: FileSourceScanExec => true
      case other => kids(other).exists(scanBelowWithoutAgg)
    }
    val bad = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        scanBelowWithoutAgg(w.child) => w
    }
    assert(bad.isEmpty,
      "partition-less windows may only ride the tiny bucket-offset table")
    assert(ns.exists {
      case w: WindowExec => w.partitionSpec.nonEmpty
      case _ => false
    }, "the rank pass must be a bucket-partitioned window")
  }

  test("text_char_entropy: row-local HOF arithmetic, no exchange before the sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the computation without the query's presentation orderBy must be
    // a single scan->project (the explode-per-character formulation
    // would shuffle the whole corpus); limit(1) stops global-sort
    // planning without changing operator shape
    import org.apache.spark.sql.functions._
    val cs = split(col("text"), "")
    val n = size(cs).cast("double")
    val counts = transform(array_distinct(cs),
      c => size(filter(cs, x => x === c)).cast("double"))
    val ent = aggregate(counts, lit(0.0),
      (acc, cnt) => acc - (cnt / n) * log2(cnt / n))
    val df = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), round(ent, 6).as("char_entropy"))
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "char entropy must not exchange")
  }

  test("text_domain_topk: per-source ranking runs the native bounded-heap node") {
    val ns = nodes(graft.queries.TextQueries.domainTopK(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.graftx.TopKPerKeyPartialExec]) &&
      ns.exists(_.isInstanceOf[
        org.apache.spark.sql.graftx.TopKPerKeyFinalExec]),
      "domain top-k must plan as partial+final TopKPerKey, not a full window sort")
    import org.apache.spark.sql.execution.window.WindowExec
    assert(!ns.exists(_.isInstanceOf[WindowExec]),
      "no window operator may appear — the heap node replaces it")
  }

  test("text_perplexity_buckets: tertile cut has no corpus-wide partition-less window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    val ns = nodes(graft.queries.TextQueries.perplexityBuckets(spark, sfDir))
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    def scanBelowWithoutAgg(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec => false
      case _: FileSourceScanExec => true
      case other => kids(other).exists(scanBelowWithoutAgg)
    }
    val bad = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        scanBelowWithoutAgg(w.child) => w
    }
    assert(bad.isEmpty,
      "partition-less windows may only ride pre-aggregated bucket tables")
  }

  test("emb_kmeans_stats: readout combines map-side, vectors never shuffle") {
    val ns = nodes(graft.queries.TrainingQueries.kmeansStats(spark, sfDir))
    val ex = ns.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(ex.forall(e => !e.child.schema.fieldNames.contains("embedding")),
      "no exchange may carry the raw embedding column")
    assert(ns.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      "cluster stats must aggregate partial+final")
  }

  test("dedup_exact_spans: every stage reads the tokenize checkpoint") {
    val ns = nodes(graft.queries.DedupQueries.exactSpans(spark, sfDir))
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) === 0,
      "grams, counts and rebuild must share the checkpointed token " +
        "table, never re-scan the corpus parquet")
  }

  test("cdc apply: no cartesian, batch collapses with partial aggregation") {
    val ns = nodes(graft.queries.EventQueries.cdcState(spark, sfDir))
    assert(!ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "snapshot-batch merge must be a keyed join, never a cross product")
    assert(!ns.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      "compaction must be max_by aggregation (map-side partial), not a " +
        "row_number window (full sort per partition)")
    val aggs = ns.count(p => p.isInstanceOf[HashAggregateExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec])
    assert(aggs >= 4, s"expected partial+final max_by pairs, saw $aggs agg nodes")
  }

  test("sim_knn_graph: heap top-k below exchange, no window, no cross join") {
    val ns = nodes(graft.queries.SimilarityQueries.knnGraph(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.graftx.TopKPerKeyPartialExec]) &&
      ns.exists(_.isInstanceOf[
        org.apache.spark.sql.graftx.TopKPerKeyFinalExec]),
      "per-query top-k must be the native bounded-heap pair")
    assert(!ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.window.WindowExec]),
      "no window sort over the candidate fan-out")
    assert(!ns.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec] ||
        p.isInstanceOf[
          org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "candidates must come from the list_id equi-join, never a cross join")
  }

  test("pipeline_dsir_weights: consumers read the checkpoint, aggs combine map-side") {
    val ns = nodes(graft.queries.PipelineQueries.dsirWeights(spark, sfDir))
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) === 0,
      "distribution fit and weight join must share the one checkpointed " +
        "tokenize pass, never re-scan the corpus")
    assert(ns.count(_.isInstanceOf[HashAggregateExec]) >= 2,
      "bucket counts and weights must aggregate partial+final")
    assert(!ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.window.WindowExec]),
      "no window operator anywhere in the weight computation")
  }

  test("sketch_kmv_distinct: map-side-combining sketch agg, no window sort") {
    val ns = nodes(graft.queries.StatsExtra.kmvDistinct(spark, sfDir))
    val aggs = ns.count(p => p.isInstanceOf[HashAggregateExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec] ||
      p.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec])
    assert(aggs >= 4,
      s"distinct + sketch build must both run partial+final, saw $aggs")
    assert(!ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.window.WindowExec]),
      "the k-th-min must come from the bounded k-min buffers, not a " +
        "per-group window sort (the oracle's formulation)")
  }

  test("stats_ks_drift: no partition-less window at all (BoundedPrefix)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // Since the bucket offsets moved to BoundedPrefix (driver-scanned
    // bounded table), the KS plan must have NO partition-less window
    // anywhere — the per-bucket CDF windows are all keyed by _b.
    val ns = nodes(graft.queries.StatsExtra.statsKsDrift(spark, sfDir))
    val bad = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      "the KS CDF must never plan a partition-less window")
  }

  test("pipeline_epoch_order: every window is partitioned (epoch/bucket)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val ns = nodes(graft.queries.PipelineQueries.epochOrder(spark, sfDir))
    val bad = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      "epoch reshuffle must never plan a partition-less window — the " +
        "offset window keys by epoch, the rank by (epoch, bucket)")
  }

  test("registry-wide: no rank-filter window survives optimization") {
    // The session-default TopKPerKeyRewrite (GraftExtensions) must
    // capture EVERY Filter(rank-bound) over a single-row_number Window
    // across the whole registry — a Catalyst upgrade or rule edit that
    // silently re-grows WindowExec under a rank filter would otherwise
    // surface only as bench noise (the round-10 verdict probed a few
    // families live; this pins all of them, every round). Checked on
    // the optimized logical plan: planning-only, no execution, so the
    // full registry costs seconds.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    def isRankBound(cond: Expression, rankIds: Set[ExprId]): Boolean = {
      def intLit(e: Expression) = e match {
        case Literal(_: Int, _) => true
        case Cast(Literal(_, _), _, _, _) => true
        case _ => false
      }
      def ref(e: Expression) = e match {
        case a: AttributeReference => rankIds.contains(a.exprId)
        case Cast(a: AttributeReference, _, _, _) => rankIds.contains(a.exprId)
        case _ => false
      }
      cond match {
        case LessThanOrEqual(a, l) => ref(a) && intLit(l)
        case LessThan(a, l) => ref(a) && intLit(l)
        case GreaterThanOrEqual(l, a) => ref(a) && intLit(l)
        case GreaterThan(l, a) => ref(a) && intLit(l)
        case EqualTo(a, l) => ref(a) && intLit(l)
        case EqualTo(l, a) => ref(a) && intLit(l)
        case _ => false
      }
    }
    // a surviving Filter+Window in the OPTIMIZED plan is fine iff the
    // planner-strategy backstop converts it (rewriteFilter is the very
    // match the strategy applies — e.g. LATERAL top-1 decorrelates
    // after the injected rule batches and is caught there); flagged
    // only when the loose shape heuristic fires but the engine's
    // matcher does NOT — the silently-kept-WindowExec case
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      val hits = plan.collect {
        case f @ Filter(cond, w: Window)
            if w.windowExpressions.size == 1 &&
              w.partitionSpec.nonEmpty &&
              w.windowExpressions.head.collectFirst {
                case WindowExpression(RowNumber(), _) => () }.nonEmpty &&
              isRankBound(cond,
                w.windowExpressions.map(_.toAttribute.exprId).toSet) &&
              org.apache.spark.sql.graftx.TopKPerKeyRewrite
                .rewriteFilter(f).isEmpty =>
          w
      }
      if (hits.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"rank-filter windows escaped TopKPerKeyRewrite in: " +
        s"${offenders.mkString(", ")} — neither the session-default " +
        "rewrite nor the strategy backstop converts them (check " +
        "GraftExtensions wiring / matcher shape)")
  }

  test("sql_lateral_subquery: decorrelated top-1 executes as TopKPerKey") {
    // the shape that motivated the strategy backstop: LATERAL
    // `ORDER BY ... LIMIT 1` becomes Filter(rn <= 1, Window) only in
    // the late RewriteSubquery batch, invisible to injected optimizer
    // rules — the planner-level match must still produce the heap node
    val ns = nodes(graft.queries.SqlApi.lateralSubquery(spark, sfDir))
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.graftx.TopKPerKeyFinalExec]),
      "lateral top-1 lost the bounded-heap plan")
    assert(!ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "lateral top-1 re-grew a window sort")
  }

  test("context windows: row-local generator, no exchange") {
    val df = graft.pipeline.CorpusPipeline.contextWindows(
      Tables(spark, sfDir, "documents"), winSize = 16, stride = 8)
    val ns = nodes(df)
    assert(!ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "window generation must not shuffle")
    assert(ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]),
      "windows must come from a Generate node")
  }
}
