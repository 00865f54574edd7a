package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Fixed-iteration PageRank over an undirected pair list — the
  * centrality diagnostic on the near-dup pair graph (which documents
  * anchor big similarity neighborhoods) and the standard iterative-join
  * workload shape: rank table joined to a PRE-PARTITIONED edge list
  * each round, so every iteration's shuffle moves only the rank table
  * (the edges stay where they are).
  *
  * Scale posture: the edge list (with per-source degree folded in) is
  * repartitioned on `src` ONCE and persisted; each of the k iterations
  * is then one shuffled join (rank, keyed by id) + one hash agg on
  * `dst`. Rank rows are (id, double) — tiny relative to the corpus.
  * For large k, checkpoint the rank table every ~10 rounds to truncate
  * lineage (the connected-components lesson); the default k=3 needs no
  * truncation. Dangling nodes cannot occur: the graph is undirected so
  * every node has out-degree >= 1.
  *
  * Float parity: per-edge `rank/deg` then a per-dst sum, teleport
  * spelled `(1 - damping) / n` — the oracle mirrors the exact op
  * order; only the FINAL rank is rounded by the caller (reassociation
  * noise in the sums).
  */
object PageRank {

  /** Driver fast-path gate (the Dedup union-find pattern): an edge
    * list under this bound runs the whole iteration in-memory — the
    * per-round join+agg jobs are pure fixed cost when the graph is
    * pair-table-sized (near-dup pair graphs are tiny relative to their
    * corpus). The distributed loop below stays the big-graph path.
    */
  private val DriverMaxEdges = 4000000L

  /** Ranks after `iters` rounds; returns (doc_id, rank) un-rounded.
    * `pairs` must carry one undirected edge per row as (ida, idb).
    */
  def ranks(pairs: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
    val nPairs = pairs.count()
    if (2 * nPairs <= DriverMaxEdges)
      ranksOnDriver(edges, iters, damping)
    else
      ranksDistributed(edges, iters, damping)
  }

  /** The distributed iteration (the over-gate path). */
  private[graft] def ranksDistributed(edges: DataFrame, iters: Int,
      damping: Double): DataFrame = {
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
    // one layout decision for the whole loop: contribution edges live
    // partitioned by src; every round's join keys match this layout
    val e = edges.join(deg, "src").repartition(col("src")).persist()
    val n = e.select(countDistinct("src")).first().getLong(0).toDouble
    val teleport = (1 - damping) / n
    var r = e.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      r = e.join(r, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("s"))
        .select(col("dst").as("id"),
          (lit(teleport) + lit(damping) * col("s")).as("rank"))
    }
    // materialize before dropping the edge cache: the returned frame
    // must not silently recompute the whole loop uncached downstream
    val out = r.select(col("id").as("doc_id"), col("rank"))
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** Personalized PageRank: teleport mass restarts at the SEED set
    * instead of uniformly — the "relevance to these documents" ranking
    * (seed = a curated slice; output = what the near-dup graph pulls
    * toward it). r_{t+1}(v) = (1-damping)·seed(v) + damping·Σ_{u→v}
    * r_t(u)/deg(u), seed(v) = 1/|S| on seeds, 0 elsewhere; r_0 = seed
    * vector. The rank table stays SPARSE — only reached nodes carry
    * rows, so at 100 TB the per-round state is neighborhood-sized, not
    * graph-sized (the whole point of PPR vs global PageRank).
    *
    * Scale shape mirrors [[ranks]]: degree-folded edges repartitioned
    * on src once and persisted; each round is one join + one hash agg,
    * then a two-term union-sum with the seed vector (≤2 addends per
    * node — IEEE-commutative, so no reassociation hazard there; the
    * per-dst contribution sum carries the same rounding contract as
    * global PageRank). `seeds` = one `doc_id` column.
    */
  def personalized(pairs: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val nPairs = pairs.count()
    if (2 * nPairs <= DriverMaxEdges)
      return personalizedOnDriver(pairs, seeds, iters, damping)
    personalizedDistributed(pairs, seeds, iters, damping)
  }

  /** The distributed PPR loop (the over-gate path). */
  private[graft] def personalizedDistributed(pairs: DataFrame,
      seeds: DataFrame, iters: Int, damping: Double): DataFrame = {
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
    val e = edges.join(deg, "src").repartition(col("src")).persist()
    // seeds restricted to graph nodes (a seed outside the graph would
    // inject mass nowhere and distort 1/|S|)
    val seedIds = e.select(col("src").as("id")).distinct()
      .join(seeds.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .persist()
    val nS = seedIds.count().toDouble
    require(nS > 0, "no seed intersects the graph")
    val teleport = (1 - damping) / nS
    val seedRows = seedIds.withColumn("rank", lit(teleport))
    var r = seedIds.withColumn("rank", lit(1.0 / nS))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg((lit(damping) * sum(col("rank") / col("deg"))).as("rank"))
        .select(col("dst").as("id"), col("rank"))
      r = contrib.unionAll(seedRows).groupBy("id")
        .agg(sum("rank").as("rank"))
    }
    val out = r.select(col("id").as("doc_id"), col("rank"))
      .localCheckpoint(true)
    e.unpersist(); seedIds.unpersist()
    out
  }

  /** In-memory PPR rounds over a collected edge list (the under-gate
    * path, [[ranksOnDriver]] template): ids handled generically (no
    * cast — the returned doc_id keeps the input column's type), same
    * arithmetic (damping·Σ rank/deg per dst, + teleport on seeds),
    * sparse rank map. Callers round at 6dp, which absorbs the per-dst
    * summation-order difference exactly as it does for [[ranks]].
    */
  private[graft] def personalizedOnDriver(pairs: DataFrame,
      seeds: DataFrame, iters: Int, damping: Double): DataFrame = {
    val spark = pairs.sparkSession
    val idType = pairs.schema("ida").dataType
    val edges = pairs.select(col("ida"), col("idb")).collect()
      .flatMap(r => Seq((r.get(0), r.get(1)), (r.get(1), r.get(0))))
    val nodes: Set[Any] = edges.iterator.map(_._1).toSet
    val seedSet: Set[Any] = seeds.select(seeds.columns.head).collect()
      .map(_.get(0)).toSet.intersect(nodes)
    require(seedSet.nonEmpty, "no seed intersects the graph")
    val deg = scala.collection.mutable.HashMap.empty[Any, Double]
    edges.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0.0) + 1.0 }
    val teleport = (1 - damping) / seedSet.size
    var r: Map[Any, Double] =
      seedSet.iterator.map(s => s -> 1.0 / seedSet.size).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.HashMap.empty[Any, Double]
      edges.foreach { case (src, dst) =>
        r.get(src).foreach { m =>
          next(dst) = next.getOrElse(dst, 0.0) + m / deg(src)
        }
      }
      val damped = next.iterator
        .map { case (id, s) => id -> damping * s }.toMap
      r = seedSet.iterator.map(s =>
        s -> (damped.getOrElse(s, 0.0) + teleport)).toMap ++
        damped.filterNot { case (id, _) => seedSet(id) }
    }
    val rows = r.toSeq
      .sortBy { case (id, _) => (String.valueOf(id), id.##) }
      .map { case (id, v) => Row(id, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("doc_id", idType, nullable = true),
        StructField("rank", DoubleType, nullable = false))))
  }

  /** The in-memory iteration over a collected edge list: identical
    * arithmetic to the distributed rounds (per-edge rank/deg, per-dst
    * sum, teleport + damping * s) — callers round the final rank, which
    * absorbs the summation-order difference exactly as it does between
    * Spark's own nondeterministic partial-merge orders (the oracle
    * enforces this parity).
    *
    * Ids are handled as opaque values (no cast): the returned `doc_id`
    * keeps the input column's exact type, so string/UUID graphs take
    * this path identically to integral ones and the operator's schema
    * contract does not narrow on small graphs.
    */
  private[graft] def ranksOnDriver(edgesDf: DataFrame, iters: Int,
      damping: Double): DataFrame = {
    val spark = edgesDf.sparkSession
    val idType = edgesDf.schema("src").dataType
    val edges = edgesDf.select(col("src"), col("dst")).collect()
      .map(row => (row.get(0), row.get(1)))
    // deterministic node order (stable output + stable idx assignment)
    // without assuming the id type is ordered: sort on string form,
    // tie-broken by the value's own hash — arithmetic is per-node so
    // the order only affects row order, never the sums
    val ids: Array[Any] = edges.map(_._1).distinct
      .sortBy(v => (String.valueOf(v), v.##))
    val idx: Map[Any, Int] = ids.zipWithIndex.toMap
    val n = ids.length
    val deg = new Array[Double](n)
    edges.foreach { case (s, _) => deg(idx(s)) += 1.0 }
    val teleport = (1 - damping) / n
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val s = new Array[Double](n)
      edges.foreach { case (src, dst) =>
        s(idx(dst)) += r(idx(src)) / deg(idx(src))
      }
      r = Array.tabulate(n)(i => teleport + damping * s(i))
    }
    val out = ids.indices.map(i => Row(ids(i), r(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField("doc_id", idType, nullable = true),
        StructField("rank", DoubleType, nullable = false))))
  }
}
