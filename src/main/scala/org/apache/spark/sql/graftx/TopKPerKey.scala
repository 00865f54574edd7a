// Lives under org.apache.spark.sql because Dataset.ofRows and the
// Column/Expression bridge are private[sql] in Spark 4.
package org.apache.spark.sql.graftx

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan: top-k rows per key, as a
  * LogicalPlan + SparkStrategy + two physical operators.
  *
  * The DataFrame-API equivalent (`row_number().over(Window.partitionBy
  * (keys).orderBy(ord)) <= k`) shuffles EVERY row to its key's reducer
  * and sorts the full partition. At 100 TB that shuffle is the job. This
  * operator instead keeps a bounded heap of k rows per key per input
  * partition (classic map-side partial aggregation, but for an operation
  * Spark's aggregate framework can't express because the "aggregate
  * state" is whole rows), so the exchange moves at most
  * `k * distinctKeys * inputPartitions` rows — for top-10-per-category
  * on a trillion-row fact table that is a ~10^5x shuffle reduction.
  *
  * Memory contract: the MAP side flushes its heaps to the stream and
  * restarts whenever retained rows reach
  * `spark.graft.topk.partialFlushRows` (default 4M) — emitting early
  * only costs shuffle reduction, never correctness, so per-task state
  * is hard-capped even when the per-partition key set grows with the
  * data. The REDUCE side holds `k * (keys hashed to the task)` rows,
  * bounded by the key clustering the exchange provides (the same
  * contract as hash aggregation's final step; raise
  * spark.sql.shuffle.partitions if a single task's key range is too
  * fat).
  *
  * Reference anchor: the reference's top-keywords-per-year need
  * (SURVEY.md §2.2 "Window functions") — this is its scale path.
  */
object TopKPerKey {

  /** Map-side state cap: flush-and-restart the partial heaps at this
    * many retained rows (session-settable, read at execution).
    */
  val PartialFlushRowsKey = "spark.graft.topk.partialFlushRows"

  /** df -> df with all columns plus `rankName` (1-based within key). */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int, rankName: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKPerKeyStrategy.type]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${lp.output.map(_.name).mkString(",")}"))
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    classic.Dataset.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrder, k, rankAttr, lp))
  }
}

case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is PRODUCED here, not read from the child — without this the
  // analyzer counts it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    // backstop for rank-filter windows that materialize AFTER the
    // injected optimizer batches (e.g. LATERAL `ORDER BY ... LIMIT 1`
    // decorrelates in the late RewriteSubquery batch): the strategy
    // sees the fully optimized plan, so the same shape match converts
    // here and the re-planned subtree hits the TopKPerKeyNode case
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      TopKPerKeyRewrite.rewriteFilter(f)
        .map(rewritten => planLater(rewritten) :: Nil).getOrElse(Nil)
    case _ => Nil
  }
}

/** Shared bounded-heap core: consume a partition, keep the k first rows
  * in `order` per key. Returns (key -> rows best-first).
  */
private[graftx] object TopKHeaps {
  /** Consumes `iter` until exhausted OR the retained-row count reaches
    * `maxRows` (replacements don't grow the count, only first-k inserts
    * and new keys do) — the caller loops, draining between rounds, so
    * map-side state is bounded even when the per-partition key set
    * grows with the data (e.g. a query side that scales with the
    * corpus). Pass Long.MaxValue for the classic single-round collect.
    */
  def collect(iter: Iterator[InternalRow], keys: Seq[Expression],
      order: Seq[SortOrder], k: Int, schema: Seq[Attribute],
      maxRows: Long = Long.MaxValue):
      mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, schema)
    // max-heap by sort order: head is the WORST retained row, so a new
    // row only displaces it when strictly better
    val rowOrd = RowOrdering.create(order, schema)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    var retained = 0L
    while (iter.hasNext && retained < maxRows) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) =>
          if (h.size < k) { h.enqueue(row.copy()); retained += 1 }
          else if (rowOrd.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
          retained += 1
      }
    }
    heaps
  }
}

/** Map-side partial: emits the surviving <=k rows per key per input
  * partition, no rank yet. Runs BEFORE the exchange.
  */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext, "partial heap flushes"))
  override protected def doExecute(): RDD[InternalRow] = {
    val out = metrics("numOutputRows")
    val flushes = metrics("numFlushes")
    val (ks, ord, kk, schema) = (keys, order, k, child.output)
    // Memory bound: the heap map holds k rows per DISTINCT KEY seen in
    // the partition; when the key set grows with the data (a kNN join's
    // query side, say) that is unbounded. At `flushRows` retained rows
    // the partial emits everything and restarts — each flush round only
    // weakens the shuffle reduction (the final exec re-heaps, so the
    // answer is unchanged), trading at most one extra k-row batch per
    // key per round against a hard cap on task memory.
    val flushRows = conf.getConfString(
      TopKPerKey.PartialFlushRowsKey, "4000000").toLong
    require(flushRows > 0, s"${TopKPerKey.PartialFlushRowsKey} must be > 0")
    child.execute().mapPartitions({ iter =>
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = iter.hasNext
        override def next(): Iterator[InternalRow] = {
          val heaps = TopKHeaps.collect(iter, ks, ord, kk, schema, flushRows)
          if (iter.hasNext) flushes.add(1)
          heaps.valuesIterator.flatMap { h => out.add(h.size); h.iterator }
        }
      }.flatten
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side final: requires clustering by key (EnsureRequirements
  * plants the hash exchange), merges the partial survivors and emits
  * rank 1..k per key.
  */
case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  // rows never leave their task, so the key clustering the exchange
  // below provided still holds above — advertising it lets any
  // downstream per-key operator (a vote groupBy on (key, label), a
  // per-key join) reuse this exchange instead of planting another
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))
  override protected def doExecute(): RDD[InternalRow] = {
    val out = metrics("numOutputRows")
    val (ks, ord, kk, schema, outAttrs) = (keys, order, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      val heaps = TopKHeaps.collect(iter, ks, ord, kk, schema)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      heaps.valuesIterator.flatMap { h =>
        // dequeueAll drains worst-first; reverse for rank 1 = best
        val best = h.dequeueAll.reverseIterator
        best.zipWithIndex.map { case (row, i) =>
          out.add(1)
          toUnsafe(joined(row, InternalRow(i + 1L)))
        }
      }
    }, preservesPartitioning = false)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
