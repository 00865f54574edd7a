package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Synchronous label propagation (Raghavan et al. 2007, the LPA
  * community detector) over an undirected pair list — the third graph
  * readout next to [[PageRank]] and the connected-components family:
  * where components answer "what is transitively linked", LPA answers
  * "where are the DENSE neighborhoods", splitting chains that
  * components would merge.
  *
  * Semantics (fully deterministic, oracle-mirrorable): every node
  * starts labeled with its own id; each round, every node
  * simultaneously adopts the label most frequent among its neighbors,
  * ties broken by the SMALLEST label. Fixed iteration count — the
  * async/randomized variant of the paper converges faster but is
  * run-order-dependent, which would make the result unpinnable.
  *
  * Scale shape (the PageRank template): the edge list is repartitioned
  * on `src` ONCE and persisted; each round is one shuffled join
  * (label table, keyed by id) + two hash aggs — per-(dst, label)
  * counts, then the per-dst argmax as a `min(struct(-n, lbl))`
  * (map-side combining; never a window). Label rows are (id, label)
  * pairs — tiny relative to any corpus. Driver fast path under the
  * same 4M-edge gate as [[PageRank]], gated on INTEGRAL ids only
  * (the tie-break is semantic here, so the long cast must be
  * loss-free; non-integral graphs always take the distributed path,
  * whose struct ordering follows the label column's natural type
  * ordering).
  */
object LabelProp {

  private val DriverMaxEdges = 4000000L

  /** Community label per node after `iters` synchronous rounds.
    * Output: (doc_id, label). `pairs` carries one undirected edge per
    * row as (ida, idb).
    */
  def communities(pairs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
    val integral = {
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(pairs.schema("ida").dataType)
    }
    val nPairs = pairs.count()
    if (integral && 2 * nPairs <= DriverMaxEdges)
      communitiesOnDriver(edges, iters)
    else
      communitiesDistributed(edges, iters)
  }

  /** The distributed loop (the over-gate / non-integral path). */
  private[graft] def communitiesDistributed(edges: DataFrame,
      iters: Int): DataFrame = {
    val e = edges.repartition(col("src")).persist()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to iters) {
      labels = e.join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("n"))
        // per-dst argmax by (count desc, label asc) as a struct-min:
        // map-side combining agg, never a window over the fan-out
        .groupBy(col("dst"))
        .agg(min(struct((-col("n")).as("negN"), col("lbl").as("l")))
          .as("top"))
        .select(col("dst").as("id"), col("top.l").as("lbl"))
    }
    val out = labels.select(col("id").as("doc_id"), col("lbl").as("label"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** In-memory rounds over a collected integral-id edge list —
    * identical rule, numeric tie order (matches the oracle's).
    */
  private[graft] def communitiesOnDriver(edgesDf: DataFrame,
      iters: Int): DataFrame = {
    val spark = edgesDf.sparkSession
    val edges = edgesDf
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = edges.map(_._1).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val adj = Array.fill(n)(List.empty[Int])
    edges.foreach { case (s, d) => adj(idx(d)) = idx(s) :: adj(idx(d)) }
    var lbl = ids.clone()
    for (_ <- 1 to iters) {
      val next = new Array[Long](n)
      var v = 0
      while (v < n) {
        val counts = scala.collection.mutable.HashMap.empty[Long, Int]
        adj(v).foreach(u => counts(lbl(u)) = counts.getOrElse(lbl(u), 0) + 1)
        next(v) = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        v += 1
      }
      lbl = next
    }
    val rows = ids.indices.map(i => Row(ids(i), lbl(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("label", LongType, nullable = false))))
  }
}
