package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale posture: the query set is always the broadcast side (ANN
  * queries are few, the corpus is the 100 TB side), so brute force is a
  * single pass over the corpus with no shuffle before the per-query
  * top-k. The LSH variants prune that pass via bucket equi-joins, and
  * candidate joins carry ONLY (qid, vec_id) — embeddings are fetched
  * back by key after dedup so the wide float arrays never ride the
  * candidate shuffle.
  */
object Similarity {

  /** Brute-force cosine top-k: corpus scan x broadcast queries ->
    * per-query top-k window. Similarities rounded to 6dp BEFORE ranking
    * so ranking is stable across engines (ties broken by vec_id).
    */
  def cosineTopK(corpus0: DataFrame, queries0: DataFrame, k: Int): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    // norms computed once per vector BEFORE the pair fan-out (same value
    // as per-pair recompute, so oracle parity is unaffected)
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val sims = c.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    topK(sims, k)
  }

  /** Map-side-combining top-k via the typed [[TopKAggregator]]: only k
    * rows per (partition, qid) reach the shuffle, versus the window
    * variant shuffling every candidate. Identical output (same
    * tie-break) — registered as its own query so the oracle pins the
    * equivalence.
    */
  def cosineTopKAgg(corpus0: DataFrame, queries0: DataFrame, k: Int): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val sims = c.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    val agg = new graft.functions.TopKAggregator(k)
    sims.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => graft.functions.ScoredId(r._2, r._3))
      .agg(agg.toColumn)
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case (s, i) =>
          (qid, s.id, s.sim, (i + 1).toLong)
        }
      }
      .toDF("qid", "vec_id", "sim", "rank")
      .orderBy("qid", "rank")
  }

  /** Hard-negative mining for contrastive training: per query, the k
    * MOST similar corpus vectors whose label differs from the query's —
    * close in embedding space but semantically wrong, the negatives
    * that actually move a contrastive loss (vs easy random negatives).
    * Same scale posture as [[cosineTopK]]: queries broadcast, one
    * corpus pass; the label predicate rides the join condition so
    * same-label candidates never reach the per-query top-k.
    */
  def hardNegatives(corpus0: DataFrame, queries0: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      col(labelCol).as("_qlabel"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val c = corpus.select(col("vec_id"), col("embedding"),
      col(labelCol).as("_clabel"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val sims = c.join(q, col("vec_id") =!= col("qid") &&
        col("_clabel") =!= col("_qlabel"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    topK(sims, k)
  }

  /** Diversified top-k via Maximal Marginal Relevance (Carbonell &
    * Goldstein 1998): greedily pick argmax of
    * `lambda * rel(c) - (1 - lambda) * max_{s in picked} sim(c, s)` —
    * relevant results that are NOT near-duplicates of results already
    * chosen (the retrieval-time counterpart of SemDeDup).
    *
    * Scale shape: a brute-force pass scores the `pool` most relevant
    * candidates per query (bounded: queries x pool rows), candidate
    * embeddings are fetched back by key join, and the greedy selection
    * runs inside `mapGroups` per query over <= pool vectors —
    * O(pool^2 * dim) row-local work, never a corpus-wide pairwise
    * product. Deterministic: relevance and pairwise sims round to 6dp
    * before comparison, ties break on vec_id.
    */
  def mmrTopK(corpus0: DataFrame, queries0: DataFrame, k: Int,
      pool: Int = 20, lambda: Double = 0.7): DataFrame = {
    require(k <= pool, s"k=$k must be <= pool=$pool")
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = cosineTopK(corpus, queries0, pool)
      .select(col("qid"), col("vec_id"), col("sim"))
    val withEmb = cands.join(
        corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("qid"), col("vec_id"), col("sim"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    withEmb.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2)) // rel desc, id asc
        val nrm = cs.map { c =>
          var s = 0.0; val e = c._4; var i = 0
          while (i < e.length) { s += e(i).toDouble * e(i).toDouble; i += 1 }
          math.sqrt(s)
        }
        def sim(a: Int, b: Int): Double = {
          val ea = cs(a)._4; val eb = cs(b)._4
          var s = 0.0; var i = 0
          while (i < ea.length) { s += ea(i).toDouble * eb(i).toDouble; i += 1 }
          r6(s / (nrm(a) * nrm(b)))
        }
        val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
        val chosen = scala.collection.mutable.BitSet.empty
        while (picked.length < math.min(k, cs.length)) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            if (!chosen(c)) {
              val div = if (picked.isEmpty) 0.0
                else picked.map(p => sim(c, p._1)).max
              val score = r6(lambda * cs(c)._3 - (1 - lambda) * div)
              // strict > with rel-desc/id-asc scan order = tie on
              // (score) breaks to higher rel then lower vec_id
              if (score > bestScore) { best = c; bestScore = score }
            }
            c += 1
          }
          picked += ((best, bestScore)); chosen += best
        }
        picked.iterator.zipWithIndex.map { case ((ci, s), i) =>
          (qid, cs(ci)._2, cs(ci)._3, s, (i + 1).toLong)
        }
      }
      .toDF("qid", "vec_id", "sim", "mmr", "pick")
      .orderBy("qid", "pick")
  }

  /** kNN-join classification: each unlabeled vector takes the majority
    * label of its k nearest labeled neighbors (weak-supervision /
    * auto-labeling primitive). Vote ties break by best similarity then
    * smallest label, so the pick is engine-deterministic. Same scale
    * posture as [[cosineTopK]]: the unlabeled BATCH broadcasts (label
    * spreading processes bounded batches; the labeled corpus is the
    * 100 TB side and is scanned once), votes aggregate map-side.
    */
  def knnClassify(labeled0: DataFrame, unlabeled0: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val labeled = VectorOps.requireVectors(labeled0, "labeled")
    val unlabeled = VectorOps.requireVectors(unlabeled0, "unlabeled")
    val q = broadcast(unlabeled.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val c = labeled.select(col("vec_id"), col("embedding"),
      col(labelCol).as("_nl"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val sims = c.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("_nl"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    // the k-nearest cut runs the native bounded-heap TopKPerKey: each
    // qid's window partition would hold the ENTIRE labeled corpus (keys
    // are the bounded query batch), so a row_number window is a
    // corpus-sized sort on a handful of reducers at 100 TB — the heaps
    // pass at most k rows per (partition, qid) to the exchange instead.
    // The label column rides through (TopKPerKey keeps all child cols).
    val knn = org.apache.spark.sql.graftx.TopKPerKey.topK(
      sims, keys = Seq("qid"),
      order = Seq(("sim", true), ("vec_id", false)), k = k)
    val votes = knn.groupBy("qid", "_nl")
      .agg(count(lit(1)).as("n_votes"), max("sim").as("best_sim"))
    val pick = Window.partitionBy("qid")
      .orderBy(col("n_votes").desc, col("best_sim").desc, col("_nl"))
    votes.withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col("qid").as("vec_id"), col("_nl").as("pred_label"),
        col("n_votes"))
  }

  private def topK(sims: DataFrame, k: Int): DataFrame =
    // native bounded-heap top-k (TopKPerKey): partial heaps run BELOW
    // the exchange, so k rows per (partition, qid) reach the shuffle
    // instead of the full candidate fan-out a row_number window drags
    // through one sort — same (sim desc, vec_id) order and rank column
    org.apache.spark.sql.graftx.TopKPerKey
      .topK(sims.select("qid", "vec_id", "sim"),
        keys = Seq("qid"), order = Seq(("sim", true), ("vec_id", false)),
        k = k)
      .orderBy("qid", "rank")

  /** Deterministic random hyperplanes: tables x bitsPerTable planes of
    * `dim` components in [-1, 1). Seeded so plans are reproducible.
    */
  private def planes(tables: Int, bitsPerTable: Int, dim: Int): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(tables, bitsPerTable, dim)((rnd.nextDouble() * 2 - 1).toFloat)
  }

  /** (t, b, i, w) hyperplane component rows — the oracle-generation
    * seam (the permRows/profileRows pattern): the planes are seeded,
    * so the DuckDB oracle bakes them as a VALUES table and re-derives
    * the sign-bit buckets with the identical ascending-index fold.
    * Components are emitted as the DOUBLE the bucketing actually
    * multiplies ([[bucketsUdf]] widens the stored float), printed via
    * Double.toString which round-trips bit-exactly.
    */
  private[graft] def lshPlaneRows(tables: Int, bitsPerTable: Int,
      dim: Int): Seq[(Int, Int, Int, Double)] = {
    val pl = planes(tables, bitsPerTable, dim)
    for {
      t <- 0 until tables
      b <- 0 until bitsPerTable
      i <- 0 until dim
    } yield (t, b, i, pl(t)(b)(i).toDouble)
  }

  /** All sign-bit bucket ids in one compiled pass (one UDF call per row,
    * not one per plane).
    */
  private def bucketsUdf(pl: Array[Array[Array[Float]]]) = udf { v: Array[Float] =>
    pl.map { table =>
      var bucket = 0L
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        var acc = 0.0
        var i = 0
        val n = math.min(plane.length, v.length)
        while (i < n) { acc += plane(i).toDouble * v(i).toDouble; i += 1 }
        if (acc > 0) bucket |= (1L << b)
        b += 1
      }
      bucket
    }
  }

  private def bucketed(df: DataFrame, idAs: String,
      pl: Array[Array[Array[Float]]]): DataFrame =
    df.select(col("vec_id").as(idAs),
        posexplode(bucketsUdf(pl)(col("embedding"))))
      .toDF(idAs, "tbl", "bucket")

  /** LSH-pruned ANN: random-hyperplane bucketing -> candidate equi-join
    * on (table, bucket), ids only -> fetch embeddings by key -> exact
    * cosine re-rank, top-k per query.
    */
  def annLshTopK(corpus0: DataFrame, queries0: DataFrame, k: Int,
      tables: Int = 16, bitsPerTable: Int = 6, dim: Int = 64): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val queries = VectorOps.requireVectors(queries0, "queries")
    val pl = planes(tables, bitsPerTable, dim)
    val cand = bucketed(corpus, "vec_id", pl)
      .join(broadcast(bucketed(queries, "qid", pl)), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm")))
    val sims = cand
      .join(q, "qid")
      .join(corpus.select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm")), "vec_id")
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    topK(sims, k)
  }

  /** Rank-correlation LSH index pairs (WTA-hash family, Yagnik et al.
    * 2011 "The Power of Comparative Reasoning"): bit b of table t is
    * the COMPARISON embedding[i] > embedding[j] for a seed-derived
    * (i, j) coordinate pair. Comparisons involve no arithmetic, so the
    * bucketing is bit-exactly reproducible by any engine reading the
    * same floats — which is what makes [[cosineDupPairs]] fully
    * oracle-checkable (random-hyperplane dot products would hinge on
    * float-sum sign parity at the margin). Deterministic in the seed.
    */
  private[graft] def cmpPlanes(tables: Int, bitsPerTable: Int, dim: Int,
      seed: Long = 7L): Array[Array[(Int, Int)]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bitsPerTable) {
      val i = rnd.nextInt(dim)
      var j = rnd.nextInt(dim)
      while (j == i) j = rnd.nextInt(dim)
      (i, j)
    }
  }

  /** (id, tbl, bucket) rows from the comparison planes — pure codegen
    * column arithmetic (no UDF): bucket = Σ_b (e[i_b] > e[j_b]) << b.
    */
  private def cmpBucketed(df: DataFrame, idAs: String,
      pl: Array[Array[(Int, Int)]]): DataFrame = {
    val buckets = pl.map { bits =>
      bits.zipWithIndex.map { case ((i, j), b) =>
        when(col("embedding")(i) > col("embedding")(j), lit(1 << b))
          .otherwise(lit(0))
      }.reduce(_ + _)
    }
    df.select(col("vec_id").as(idAs),
        posexplode(array(buckets.map(_.cast("int")): _*)))
      .toDF(idAs, "tbl", "bucket")
  }

  /** Embedding-cosine near-dup pairs (the embedding flavor of dedup):
    * LSH-bucket candidates (ids only) via the comparison family
    * ([[cmpPlanes]] — engine-portable, hence DuckDB-oracle-checked end
    * to end), fetch vectors after dedup, keep pairs with cosine >=
    * threshold.
    */
  def cosineDupPairs(corpus0: DataFrame, threshold: Double,
      tables: Int = 16, bitsPerTable: Int = 6, dim: Int = 64): DataFrame = {
    val corpus = VectorOps.requireVectors(corpus0, "corpus")
    val pl = cmpPlanes(tables, bitsPerTable, dim)
    // barrier on the join key: bucketing computes ONCE; both self-join
    // sides read the reused, already co-partitioned exchange
    val b = cmpBucketed(corpus, "vec_id", pl)
      .repartition(col("tbl"), col("bucket"))
    val cand = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      .distinct()
    val e = (side: String) => corpus.select(
      col("vec_id").as(side),
      col("embedding").as(s"emb_$side"),
      VectorOps.norm(col("embedding")).as(s"nrm_$side"))
    cand
      .join(e("ida"), "ida")
      .join(e("idb"), "idb")
      .select(col("ida"), col("idb"),
        VectorOps.simRound6(VectorOps.dot(col("emb_ida"), col("emb_idb")) /
          (col("nrm_ida") * col("nrm_idb"))).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy("ida", "idb")
  }
}
