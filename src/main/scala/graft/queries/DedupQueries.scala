package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ChunkDedup, Decontaminate, Dedup}

/** Deduplication operators registered against the `documents` table.
  * Exact + shingle-Jaccard are DuckDB-oracle checked; MinHash-LSH and
  * SimHash use engine-specific hashes (xxhash64) so they get rows-only
  * driver checks plus containment/agreement unit tests (DedupSpec).
  */
object DedupQueries {

  /** Exact dedup: md5 digest groupBy — the only shuffle is on digest. */
  def exactMd5(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
      .orderBy("digest")

  /** The verified pair graph all jaccard-family queries share — one
    * materialization per (dir, params) via NearDupGraph (the pipeline
    * computes the expensive artifact once; clustering, survivors and
    * diagnostics derive from it).
    */
  private[graft] def sharedPairs(spark: SparkSession, dir: String) =
    // minShared=2 opted into HERE (not the API default): the documents
    // table has no 1-2-shingle docs, so the candidate cut is free; the
    // oracle's pairsCte carries the matching HAVING count(*) >= 2
    graft.operators.NearDupGraph.pairs(Tables(spark, dir, "documents"),
      "doc_id", "text", threshold = 0.2, dfCap = 50, minShared = 2,
      cacheKey = dir)

  /** Asymmetric CONTAINMENT dedup (Broder's containment coefficient):
    * |A∩B| / min(|A|, |B|) over shingle sets — the detector for
    * quote/subset inclusion that symmetric Jaccard structurally
    * under-scores (a 50-shingle doc fully contained in a 500-shingle
    * doc has Jaccard 0.1 but containment 1.0). Reads the SAME shared
    * blocking cascade as the Jaccard family (candidates + the shingle
    * checkpoint — nothing recomputed); verification is a codegen
    * array_intersect over the bounded candidate pairs. Oracle-checked
    * (integer intersection counts, one rounded division). The
    * shingle-fetch strategy is the graph's size-gated decision
    * ([[graft.operators.Dedup.shingleBroadcastFits]]) — never a forced
    * corpus-side broadcast.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.operators.NearDupGraph.graph(
      Tables(spark, dir, "documents"), "doc_id", "text",
      threshold = 0.2, dfCap = 50, minShared = 2, cacheKey = dir)
    containmentFrom(g.candidates, g.shingles, Some(g.broadcastFit))
  }

  /** The containment verify over any (candidates, shingles) pair —
    * shared by the registered query and the broadcast-off scale
    * rehearsal (which proves the hint is a pure strategy choice).
    */
  private[graft] def containmentFrom(cand: DataFrame, sh: DataFrame,
      hint: Option[Boolean]): DataFrame =
    Dedup.fetchShingles(cand, sh, hint)
      .select(col("ida"), col("idb"),
        org.apache.spark.sql.graftx.RoundAwayFromZero.column(
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            least(size(col("sha")), size(col("shb"))), 6).as("containment"))
      .where(col("containment") >= 0.7)
      .orderBy("ida", "idb")

  /** Jaro-Winkler fuzzy matching — the record-linkage scalar for short
    * strings (names/titles/identifiers), char-order-aware where the
    * shingle family is set-based: top-3 most similar OTHER part names
    * per probe part, scored by the native codegen
    * [[org.apache.spark.sql.graftx.JaroWinkler]] expression (DuckDB
    * `jaro_winkler_similarity` semantics, bit-exact — the oracle).
    * Scale shape: bounded probe side broadcast, corpus scanned once,
    * per-probe top-3 through the native bounded-heap rewrite.
    */
  def jaroNames(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Tables(spark, dir, "part").select("p_partkey", "p_name")
    val probe = part.where(col("p_partkey") < 30)
      .select(col("p_partkey").as("qk"), col("p_name").as("qn"))
    val sims = part.join(broadcast(probe), col("p_partkey") =!= col("qk"))
      .select(col("qk"), col("p_partkey").as("pk"),
        org.apache.spark.sql.graftx.RoundAwayFromZero.column(
          org.apache.spark.sql.graftx.JaroWinkler.column(
            col("qn"), col("p_name")), 6).as("sim"))
    val w = Window.partitionBy("qk").orderBy(col("sim").desc, col("pk"))
    sims
      .select(col("qk"), col("pk"), col("sim"),
        row_number().over(w).cast("long").as("rank"))
      .where(col("rank") <= 3)
      .orderBy("qk", "rank")
  }

  def shingleJaccard(spark: SparkSession, dir: String): DataFrame =
    sharedPairs(spark, dir).orderBy("ida", "idb")

  /** Blocking economics of the shared pair graph's parameters:
    * reduction ratio vs all-pairs and verification precision — the
    * numbers that justify (or indict) a blocking configuration. Counts
    * the SHARED candidate/pair materializations (NearDupGraph) — the
    * blocking cascade is never recomputed for the audit.
    */
  def blockingAudit(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.operators.NearDupGraph.graph(
      Tables(spark, dir, "documents"), "doc_id", "text",
      threshold = 0.2, dfCap = 50, minShared = 2, cacheKey = dir)
    Dedup.blockingReadout(spark, g.nDocs, g.candidates.count(),
      g.pairs.count())
  }

  /** LSH quality audit: MinHash-LSH pairs vs the exact-blocking pair
    * set at the SAME threshold — the recall readout a production dedup
    * deployment monitors when it trades the exact inverted-index
    * cascade for banded signatures (precision is 1.0 by construction:
    * LSH candidates are exact-verified). One row: counts, misses,
    * recall. Golden-pinned (the MinHash side has no SQL equivalent);
    * the banding theory says recall at 0.5 with 16x4 bands is ~1 for
    * strong pairs, and the miss count makes any silent recall
    * regression a hash flip.
    */
  /** One MinHash-LSH pair table per (session, dir), shared by the
    * standalone pair query and the quality audit (the NearDupGraph
    * memo rationale — the banded cascade is the expensive artifact).
    */
  private val lshCache =
    new graft.SessionMemo[DataFrame](8)(graft.SessionMemo.free)
  private[graft] def sharedLshPairs(spark: SparkSession, dir: String): DataFrame =
    lshCache.getOrElseUpdate(spark, dir) {
      Dedup.minhashLshPairs(Tables(spark, dir, "documents"),
          "doc_id", "text", threshold = 0.5)
        .localCheckpoint(true)
    }

  def lshQuality(spark: SparkSession, dir: String): DataFrame = {
    // exact pairs at 0.5 = the SHARED 0.2-threshold graph filtered on
    // its verified jaccard column (same candidates, same dfCap/
    // minShared, verify filters after the exact score) — the whole
    // dedup family keeps materializing ONE blocking cascade
    val exact = sharedPairs(spark, dir)
      .where(col("jaccard") >= 0.5)
      .select("ida", "idb")
    val lsh = sharedLshPairs(spark, dir).select("ida", "idb")
    // ONE action for all three counts (round 14; was a checkpoint +
    // two counts + an intersect count = four driver round-trips over
    // the two memoized pair tables): both sides are DISTINCT by
    // construction (candidates are de-duplicated before the 1:1
    // verify fetch), so a tagged full-outer join counts exact/lsh/
    // common in a single aggregation — identical arithmetic.
    val r = exact.withColumn("_e", lit(1L))
      .join(lsh.withColumn("_l", lit(1L)), Seq("ida", "idb"), "full_outer")
      .agg(
        coalesce(sum("_e"), lit(0L)),
        coalesce(sum("_l"), lit(0L)),
        coalesce(count(when(col("_e").isNotNull && col("_l").isNotNull,
          lit(1))), lit(0L)))
      .collect()(0)
    val (nExact, nLsh, nCommon) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    import spark.implicits._
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((nExact, nLsh, nCommon, nExact - nCommon,
        if (nExact == 0) 1.0 else r4(nCommon.toDouble / nExact)))
      .toDF("n_exact", "n_lsh", "n_common", "n_missed", "recall")
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    sharedLshPairs(spark, dir).orderBy("ida", "idb")

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables(spark, dir, "documents"),
        "doc_id", "text", maxHamming = 3)
      .orderBy("ida", "idb")

  /** Cluster ids for every doc in a near-dup cluster (min-id label).
    * Runs over the EXACT shingle-Jaccard pair graph (same parameters as
    * `dedup_shingle_jaccard`) so the clustering itself is DuckDB-oracle
    * checked via a recursive-CTE transitive closure; the MinHash-LSH
    * pair path gets the same clustering through `Dedup.survivors` in
    * the corpus pipeline + DedupSpec agreement tests.
    */
  def components(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(sharedPairs(spark, dir))
      .orderBy("doc_id")

  /** The corpus after near-dup removal (one representative per cluster),
    * over the same oracle-checkable exact pair graph.
    */
  def survivors(spark: SparkSession, dir: String): DataFrame =
    Dedup.survivorsFromPairs(Tables(spark, dir, "documents"), "doc_id",
        sharedPairs(spark, dir))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Quality-aware canonical selection: within each near-dup cluster
    * the KEPT document is the one with the highest quality logit (ties:
    * lowest doc_id) instead of the smallest id — the production
    * curation policy of "keep the best copy, not the first seen".
    * Cost over plain survivors is one partitioned window over the
    * component-labelled docs; singletons (component = self) pass
    * through the same path untouched.
    */
  def survivorsQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val comps = Dedup.connectedComponents(sharedPairs(spark, dir))
      .withColumnRenamed("doc_id", "cid")
    val (_, logit) = TextQueries.qualityLogit
    docs
      .join(comps, col("doc_id") === col("cid"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("q", logit)
      .withColumn("rn", row_number().over(
        Window.partitionBy("component")
          .orderBy(col("q").desc, col("doc_id"))))
      .where(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: every 25th doc plays the held-out eval
    * set; the rest of the corpus is flagged when it shares >= 5
    * distinct trigram shingles with any of it. The planted near-dup
    * pairs guarantee real hits at every SF.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Decontaminate.flag(
        docs.where(pmod(col("doc_id"), lit(25)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(25)) === 0),
        "doc_id", "text", minShared = 5)
      .orderBy("doc_id")
  }

  /** Cross-source contamination matrix: distinct trigram-shingle
    * overlap between every source pair — the "is subset A leaking into
    * subset B" audit run before declaring eval/train subsets disjoint.
    * Shape at 100 TB: shingles collapse to DISTINCT (source, hash)
    * first (one shuffle), and the self-join's per-gram fan-out is
    * bounded by the SOURCE COUNT (≤ C(n_sources, 2) pairs per gram) —
    * the matrix itself is n_sources²-bounded however large the corpus.
    * Per-source set sizes ride a broadcast join for the Jaccard.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // DELIBERATELY un-checkpointed (round 10 A/B): the three consumers
    // (sizes + both self-join sides) re-derive the distinct
    // (source, shingle) table, which measured FASTER here than
    // materializing it once (1.5 s vs 1.6-1.8 s at sf0.1 — the
    // pipelined recomputes overlap, the checkpoint write is serial).
    // At true corpus scale the tradeoff flips (three full scans vs
    // one), so a 100 TB deployment should insert
    // `.localCheckpoint(true)` after the distinct — the audit is
    // n_sources^2-bounded either way.
    val ss = Tables(spark, dir, "documents")
      .select(col("source"), explode(
        org.apache.spark.sql.graftx.TextShingles.column(col("text")))
        .as("s"))
      .distinct()
    val sizes = ss.groupBy("source").agg(count(lit(1)).as("n"))
    ss.as("x").join(ss.as("y"),
        col("x.s") === col("y.s") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "na")), "source_a")
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared") / (col("na") + col("nb") - col("n_shared")), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Sub-document dedup: 10-token chunks deduplicated corpus-wide,
    * documents reassembled from surviving chunks (CCNet-style).
    */
  def chunkLevel(spark: SparkSession, dir: String): DataFrame =
    ChunkDedup.dedupChunks(Tables(spark, dir, "documents"),
        "doc_id", "text", unit = 10)
      .orderBy("doc_id")

  /** Incremental ingest dedup: index 80% of the corpus once, probe the
    * remaining 20% as the "new batch" through the persisted LSH index
    * (build-once / probe-cheap — the batch never triggers corpus-wide
    * recomputation). Full oracle: [[MinHashOracle.incrementalBatch]]
    * replays the banded signatures in DuckDB; IncrementalDedupSpec
    * additionally pins exact agreement with the full-corpus run.
    */
  def incrementalBatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // build-once is the point of the index: only (re)build when absent
    // (keyed by the FULL sanitized dataset path — hashCode collides —
    // with a completion marker written after BOTH index dirs land, the
    // same cache discipline as bm25IndexTopK; a real deployment
    // versions the index path by corpus snapshot)
    // v2: hash-prefix-partitioned layout (a pre-v2 cached index would
    // still probe correctly via the meta-less fallback, but the plan
    // pin wants the pruned shape — version the cache key instead)
    // v3: auto-sized key bloom (a v2 index probes fine via the legacy
    // geometry fallback, but keeps broadcasting the oversized fixed-
    // capacity bitmap on every probe)
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_lsh_idx_v3_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new java.io.File(s"$idx/_GRAFT_INDEX_COMPLETE")
    if (!marker.exists()) {
      Dedup.writeLshIndex(docs.where(pmod(col("doc_id"), lit(5)) =!= 0),
        "doc_id", "text", idx)
      marker.createNewFile()
    }
    Dedup.dedupAgainstIndex(docs.where(pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", idx, threshold = 0.5)
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_matches"), max("jaccard").as("max_jaccard"))
      .orderBy("batch_id")
  }

  /** [[incrementalBatch]]'s twin over the STREAMING (run-manifest)
    * index layout — the layout months of `StreamingFunnel` ingest
    * actually probe: the same 80% corpus lands as four
    * `appendToLshIndex(subdir=...)` micro-batch runs, ONE tiered
    * maintenance cycle folds them into a merged prefix-partitioned run
    * ([[Dedup.maintainLshIndex]] — the folded-away source runs linger
    * on disk inside their retention grace, exactly the state a probe
    * must NOT re-read), and the probe resolves the run manifest to
    * read exactly the live run set. Same corpus, same probe, same
    * threshold as the flat twin, so the SAME oracle SQL binds it: the
    * row goes red if manifest resolution ever double-counts (dead
    * runs resurrected — duplicated shingle rows multiply the verify
    * join) or tears (the merged run missed — matches vanish).
    */
  def incrementalStream(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // same build-once cache discipline as incrementalBatch (full
    // sanitized path key + completion marker after the fold commits)
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_lsh_stm_v1_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new java.io.File(s"$idx/_GRAFT_INDEX_COMPLETE")
    if (!marker.exists()) {
      val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
      (0 until 4).foreach(b => Dedup.appendToLshIndex(
        corpus.where(pmod(col("doc_id"), lit(4)) === b),
        "doc_id", "text", idx, subdir = Some(b.toLong)))
      // four tier-0 runs == the default tierMinRuns threshold: one
      // cycle folds them all into one merged run
      val folds = Dedup.maintainLshIndex(spark, idx)
      require(folds >= 1, s"expected a tier fold, got $folds")
      marker.createNewFile()
    }
    Dedup.dedupAgainstIndex(docs.where(pmod(col("doc_id"), lit(5)) === 0),
        "doc_id", "text", idx, threshold = 0.5)
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_matches"), max("jaccard").as("max_jaccard"))
      .orderBy("batch_id")
  }

  /** Fuzzy join (entity resolution): every 10th document, with its
    * first five words stripped, plays an external probe list to be
    * resolved against the corpus by trigram-shingle similarity — the
    * cross-TABLE form of near-dup blocking (same shuffle-bounded
    * shape, no cross join).
    */
  def fuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val probes = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id").as("probe_id"),
        regexp_replace(col("text"), "^(\\S+\\s+){5}", "").as("ptext"))
    Dedup.fuzzyJoin(docs, "doc_id", "text",
        probes, "probe_id", "ptext", threshold = 0.5)
      .orderBy("lid", "rid")
  }

  /** Cluster-size histogram over the exact near-dup components — the
    * standard dedup diagnostic (how much mass sits in big clusters).
    */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(sharedPairs(spark, dir))
      .groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("size")

  /** Per-node structure of the near-dup pair graph: degree + triangle
    * participation — the diagnostic separating chain-shaped clusters
    * (template drift: transitive pairs, few triangles) from clique-
    * shaped ones (true copy bursts). Triangle enumeration on the
    * ordered edge list (ida < idb by construction): two equi-joins,
    * candidates bounded by paths of length 2 — no cross join. At
    * 100 TB the pair graph is orders of magnitude smaller than the
    * corpus, and degree-ordering the edges (standard compact-forward)
    * would bound the join further; the verified graph here is already
    * df-capped upstream so max degree is bounded by blocking.
    */
  def graphNodeStats(spark: SparkSession, dir: String): DataFrame = {
    val e = sharedPairs(spark, dir).select("ida", "idb")
    val deg = e.select(col("ida").as("doc_id"))
      .unionAll(e.select(col("idb").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.idb") === col("e2.ida"))
      .join(e.as("e3"),
        col("e3.ida") === col("e1.ida") && col("e3.idb") === col("e2.idb"))
      .select(explode(array(
        col("e1.ida"), col("e1.idb"), col("e2.idb"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** Fixed-iteration PageRank over the same verified pair graph — which
    * documents anchor the biggest similarity neighborhoods. Three
    * rounds, damping 0.85; the oracle unrolls the identical arithmetic
    * as three CTE stages so the whole iterative-join loop is
    * value-checked, not just row-counted.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.ranks(sharedPairs(spark, dir), iters = 3)
      .select(col("doc_id"), round(col("rank"), 6).as("rank"))
      .orderBy("doc_id")

  /** Synchronous label-propagation communities over the SAME shared
    * near-dup pair graph ([[graft.operators.LabelProp]]): where
    * `dedup_components` answers "what is transitively linked", LPA
    * marks the dense neighborhoods, splitting chains components
    * would merge. Oracle-checked — the fixed-round deterministic
    * variant unrolls to three windowed-argmax CTE stages in DuckDB
    * (the graph_pagerank iteration-oracle pattern).
    */
  def labelProp(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LabelProp.communities(sharedPairs(spark, dir),
        iters = 3)
      .orderBy("doc_id")

  /** Personalized PageRank from the doc_id % 7 == 0 seed slice of the
    * near-dup graph ([[graft.operators.PageRank.personalized]]):
    * relevance-to-the-seeds instead of global centrality. Oracle =
    * three unrolled rounds replicating the union-sum shape exactly
    * (teleport spelled (1 - 0.85)/|S| in both engines — the IEEE
    * literal discipline the global pagerank oracle established).
    */
  def pprSeeded(spark: SparkSession, dir: String): DataFrame = {
    val pairs = sharedPairs(spark, dir)
    val seeds = pairs.select(col("ida").as("doc_id"))
      .unionAll(pairs.select(col("idb").as("doc_id")))
      .distinct()
      .where(pmod(col("doc_id"), lit(7)) === 0)
    graft.operators.PageRank.personalized(pairs, seeds, iters = 3)
      .select(col("doc_id"), round(col("rank"), 6).as("rank"))
      .orderBy("doc_id")
  }

  /** Newman modularity of the LPA communities, decomposed PER
    * community: contribution_c = intra_c/m - (degsum_c/(2m))^2.
    * Deliberately NOT summed to one Q: every row derives from
    * integers (edge/degree counts) so it is bit-exact cross-engine,
    * while a global float sum over communities would be partial-agg-
    * order dependent. The per-community rows are also the actionable
    * readout (which neighborhoods are denser than chance). Scale
    * shape: two label joins on the pair table + hash aggs — no
    * windows, no iteration beyond the shared LPA labels.
    */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = sharedPairs(spark, dir).select("ida", "idb")
    val labels = graft.operators.LabelProp.communities(pairs, iters = 3)
    val m = pairs.count().toDouble
    val la = labels.select(col("doc_id").as("ida"), col("label").as("la"))
    val lb = labels.select(col("doc_id").as("idb"), col("label").as("lb"))
    val intra = pairs.join(la, "ida").join(lb, "idb")
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = pairs.select(col("ida").as("doc_id"))
      .unionAll(pairs.select(col("idb").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    val dHalf = col("degree_sum").cast("double") / lit(2 * m)
    labels.join(deg, "doc_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("degree_sum"))
      .join(intra, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        round(coalesce(col("intra_edges"), lit(0L)).cast("double") /
          lit(m) - dHalf * dHalf, 6).as("contribution"))
      .orderBy("label")
  }

  /** Exact-substring span dedup (Lee et al. 2022 style): duplicated
    * 10-token windows keep only their globally-first occurrence; docs
    * are rebuilt from surviving tokens. Fully oracle-checked — the
    * md5-digest election replays bit-for-bit in DuckDB.
    */
  def exactSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SpanDedup.dedupSpans(
      Tables(spark, dir, "documents"), "doc_id", "text", n = 10)

  /** SemDeDup over the embeddings table ([[graft.operators.SemDedup]]):
    * 8 Lloyd clusters (2 rounds), semantic-dup threshold 0.4. Golden-
    * pinned — the k-means iteration is not SQL-expressible; the prune
    * machinery itself is oracle-checked by `dedup_semantic_bylabel`.
    */
  def semantic(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SemDedup.dedup(
      Tables(spark, dir, "embeddings"), k = 8, iters = 2, eps = 0.4)
      .orderBy("vec_id")

  /** The SemDeDup prune chain (pairs -> components -> least-prototypical
    * keeper) with an EXTERNAL clustering — the label column — so the
    * whole decision is SQL-expressible and oracle-checked: dist2 =
    * squared distance to the label centroid, rounded to 6 (the
    * cross-engine comparison contract) before the keeper argmax.
    */
  def semanticByLabel(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val long = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
    val cent = long.groupBy("label", "dim")
      .agg(avg(col("v").cast("double")).as("c"))
    val d2 = long.join(cent, Seq("label", "dim"))
      .groupBy("vec_id")
      .agg(round(sum((col("v").cast("double") - col("c")) *
        (col("v").cast("double") - col("c"))), 6).as("dist2"))
    val assigned = emb.join(d2, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        col("label").as("cluster"), col("dist2"))
    graft.operators.SemDedup.prune(assigned, eps = 0.4).orderBy("vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_semantic" -> semantic,
    "dedup_semantic_bylabel" -> semanticByLabel,
    "dedup_exact_spans" -> exactSpans,
    "graph_pagerank" -> pagerank,
    "graph_label_prop" -> labelProp,
    "graph_modularity" -> modularity,
    "graph_ppr_seeded" -> pprSeeded,
    "graph_node_stats" -> graphNodeStats,
    "join_fuzzy_probe" -> fuzzyNames,
    "join_jaro_names" -> jaroNames,
    "dedup_cluster_sizes" -> clusterSizes,
    "dedup_incremental_batch" -> incrementalBatch,
    "dedup_incremental_stream" -> incrementalStream,
    "dedup_chunk_level" -> chunkLevel,
    "dedup_decontaminate" -> decontaminate,
    "dedup_source_overlap" -> sourceOverlap,
    "dedup_components" -> components,
    "dedup_survivors" -> survivors,
    "dedup_survivors_quality" -> survivorsQuality,
    "dedup_exact_md5" -> exactMd5,
    "dedup_shingle_jaccard" -> shingleJaccard,
    "dedup_containment" -> containmentPairs,
    "dedup_blocking_audit" -> blockingAudit,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_lsh_quality" -> lshQuality,
    "dedup_simhash" -> simhashPairs)

  private val tokSql =
    raw"list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '')"

  /** Shared CTE chain producing the exact verified pair table —
    * identical to the Spark jaccardPairs(threshold=0.2, dfCap=50).
    */
  private[queries] val pairsCte =
    raw"""toks AS (
  SELECT doc_id, $tokSql AS ws FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM toks WHERE len(ws) >= 3
), ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
df AS (SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 50),
exc AS (SELECT ex.doc_id, ex.s FROM ex JOIN df USING (s)),
cand AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb
  FROM exc a JOIN exc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
), verified AS (
  SELECT ida, idb,
    round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
      (CAST(len(x.shs) AS DOUBLE) + CAST(len(y.shs) AS DOUBLE)
        - CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)), 6) AS jaccard
  FROM cand JOIN sh x ON x.doc_id = ida JOIN sh y ON y.doc_id = idb
), pairs AS (SELECT ida, idb FROM verified WHERE jaccard >= 0.2)"""

  /** Three unrolled synchronous-LPA rounds over `pairs` (shared by the
    * graph_label_prop and graph_modularity oracles): l3 = (id, lbl).
    */
  private val lpaCte =
    raw"""edges AS (
  SELECT ida AS src, idb AS dst FROM pairs
  UNION ALL SELECT idb AS src, ida AS dst FROM pairs
), l0 AS (
  SELECT DISTINCT src AS id, src AS lbl FROM edges
), l1 AS (
  SELECT id, lbl FROM (
    SELECT e.dst AS id, l.lbl,
      row_number() OVER (PARTITION BY e.dst
        ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN l0 l ON l.id = e.src GROUP BY e.dst, l.lbl
  ) WHERE rn = 1
), l2 AS (
  SELECT id, lbl FROM (
    SELECT e.dst AS id, l.lbl,
      row_number() OVER (PARTITION BY e.dst
        ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN l1 l ON l.id = e.src GROUP BY e.dst, l.lbl
  ) WHERE rn = 1
), l3 AS (
  SELECT id, lbl FROM (
    SELECT e.dst AS id, l.lbl,
      row_number() OVER (PARTITION BY e.dst
        ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN l2 l ON l.id = e.src GROUP BY e.dst, l.lbl
  ) WHERE rn = 1
)"""

  /** Min-label connected components as a recursive transitive closure
    * (tiny in DuckDB at sf0.01; the Spark side is the scalable
    * label-propagation loop).
    */
  private val compCte =
    raw"""$pairsCte,
edges AS (
  SELECT ida AS src, idb AS dst FROM pairs
  UNION SELECT idb, ida FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
)"""

  private val dotSql = (a: String, b: String) =>
    s"list_sum(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private val nrmSql = (a: String) =>
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  val oracle: Map[String, String] = Map(
    // round-7 conversions: the full MinHash/SimHash signature pipeline
    // replayed in HUGEINT — see MinHashOracle for the machinery
    "dedup_minhash_lsh" -> MinHashOracle.minhashLsh,
    "dedup_lsh_quality" -> MinHashOracle.lshQuality,
    "dedup_incremental_batch" -> MinHashOracle.incrementalBatch,
    // the streaming-layout twin probes the SAME corpus with the SAME
    // semantics — one oracle binds both (red on double-count/tear)
    "dedup_incremental_stream" -> MinHashOracle.incrementalBatch,
    "dedup_simhash" -> MinHashOracle.simhash,
    // round-10 conversion: the k-means clustering's final centroids
    // baked (KmeansBakedData), the FULL SemDeDup prune chain replayed
    "dedup_semantic" -> KmeansOracle.dedupSemantic,
    "dedup_semantic_bylabel" ->
      raw"""WITH RECURSIVE p AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(${dotSql("a.embedding", "b.embedding")} /
    (${nrmSql("a.embedding")} * ${nrmSql("b.embedding")}), 6) >= 0.4
), edges AS (
  SELECT ida AS src, idb AS dst FROM p UNION SELECT idb, ida FROM p
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS vec_id, least(src, min(dst)) AS component
  FROM reach GROUP BY src
), cent AS (
  SELECT label, u.i AS dim, avg(CAST(embedding[u.i] AS DOUBLE)) AS c
  FROM embeddings,
    LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u
  GROUP BY 1, 2
), d2 AS (
  SELECT e.vec_id,
    round(sum((CAST(e.embedding[u.i] AS DOUBLE) - c.c) *
      (CAST(e.embedding[u.i] AS DOUBLE) - c.c)), 6) AS dist2
  FROM embeddings e,
    LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) u
  JOIN cent c ON c.label = e.label AND c.dim = u.i
  GROUP BY 1
), keeper AS (
  SELECT component, vec_id AS kid FROM (
    SELECT cp.component, d.vec_id,
      row_number() OVER (PARTITION BY cp.component
        ORDER BY d.dist2 DESC, d.vec_id DESC) AS rn
    FROM comp cp JOIN d2 d ON d.vec_id = cp.vec_id) WHERE rn = 1
)
SELECT e.vec_id, e.label AS cluster, cp.component,
  (cp.component IS NULL OR e.vec_id = k.kid) AS keep
FROM embeddings e
LEFT JOIN comp cp ON cp.vec_id = e.vec_id
LEFT JOIN keeper k ON k.component = cp.component
ORDER BY e.vec_id""",
    "dedup_exact_spans" ->
      raw"""WITH toks AS (
  SELECT doc_id, $tokSql AS ws FROM documents
), grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
    md5(array_to_string(ws[CAST(u.i + 1 AS BIGINT):CAST(u.i + 10 AS BIGINT)],
      ' ')) AS g
  FROM toks, LATERAL (SELECT unnest(range(0, len(ws) - 9)) AS i) u
), ranked AS (
  SELECT doc_id, s,
    row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn
  FROM grams
), removed AS (
  SELECT DISTINCT doc_id, CAST(u.idx AS BIGINT) AS idx
  FROM ranked, LATERAL (SELECT unnest(range(s, s + 10)) AS idx) u
  WHERE rn > 1
), tokidx AS (
  SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS idx,
    ws[CAST(u.i AS BIGINT)] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
), kept AS (
  SELECT k.doc_id,
    md5(array_to_string(list(k.tok ORDER BY k.idx), ' ')) AS kept_digest,
    count(*) AS n_kept
  FROM tokidx k
  ANTI JOIN removed r ON k.doc_id = r.doc_id AND k.idx = r.idx
  GROUP BY k.doc_id
)
SELECT b.doc_id, CAST(len(b.ws) AS BIGINT) AS n_tokens,
  CAST(len(b.ws) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
  coalesce(kept_digest, md5('')) AS kept_digest
FROM toks b LEFT JOIN kept USING (doc_id)
ORDER BY doc_id""",
    "graph_pagerank" ->
      raw"""WITH $pairsCte,
edges AS (
  SELECT ida AS src, idb AS dst FROM pairs
  UNION ALL SELECT idb AS src, ida AS dst FROM pairs
), deg AS (
  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
), ed AS (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
r0 AS (SELECT src AS id, 1.0 / nn.n AS rank FROM deg, nn),
r1 AS (
  SELECT ed.dst AS id,
    (1 - 0.85) / nn.n + 0.85 * sum(r.rank / ed.deg) AS rank
  FROM ed JOIN r0 r ON r.id = ed.src, nn GROUP BY ed.dst, nn.n
), r2 AS (
  SELECT ed.dst AS id,
    (1 - 0.85) / nn.n + 0.85 * sum(r.rank / ed.deg) AS rank
  FROM ed JOIN r1 r ON r.id = ed.src, nn GROUP BY ed.dst, nn.n
), r3 AS (
  SELECT ed.dst AS id,
    (1 - 0.85) / nn.n + 0.85 * sum(r.rank / ed.deg) AS rank
  FROM ed JOIN r2 r ON r.id = ed.src, nn GROUP BY ed.dst, nn.n
)
SELECT id AS doc_id, round(rank, 6) AS rank FROM r3 ORDER BY doc_id""",
    // synchronous LPA, 3 unrolled rounds: per round, every node adopts
    // its neighbors' most frequent label (count desc, label asc) — the
    // windowed argmax mirrors Spark's min(struct(-n, lbl)) exactly
    "graph_label_prop" ->
      raw"""WITH $pairsCte,
$lpaCte
SELECT id AS doc_id, lbl AS label FROM l3 ORDER BY doc_id""",
    // Newman modularity decomposed PER COMMUNITY over the LPA labels:
    // contribution_c = intra_c/m - (degsum_c/(2m))^2 — every term
    // derives from integers, so each row is bit-exact cross-engine
    // with no global float sum (the square is spelled x*x, not
    // pow(x, 2), to keep the op sequence identical in both engines)
    "graph_modularity" ->
      raw"""WITH $pairsCte,
$lpaCte,
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM pairs),
labA AS (
  SELECT p.ida, p.idb, la.lbl AS la, lb.lbl AS lb
  FROM pairs p JOIN l3 la ON la.id = p.ida JOIN l3 lb ON lb.id = p.idb
), intra AS (
  SELECT la AS label, CAST(count(*) AS BIGINT) AS intra_edges
  FROM labA WHERE la = lb GROUP BY la
), deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT ida AS doc_id FROM pairs UNION ALL SELECT idb FROM pairs
  ) GROUP BY doc_id
), byc AS (
  SELECT l3.lbl AS label, CAST(count(*) AS BIGINT) AS n_nodes,
    CAST(sum(d.deg) AS BIGINT) AS degree_sum
  FROM l3 JOIN deg d ON d.doc_id = l3.id GROUP BY l3.lbl
)
SELECT byc.label, byc.n_nodes,
  CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
  byc.degree_sum,
  round(CAST(coalesce(i.intra_edges, 0) AS DOUBLE) / m.m -
    (CAST(byc.degree_sum AS DOUBLE) / (2 * m.m)) *
    (CAST(byc.degree_sum AS DOUBLE) / (2 * m.m)), 6) AS contribution
FROM byc LEFT JOIN intra i USING (label), m
ORDER BY byc.label""",
    // PPR, 3 unrolled rounds: contribution agg then a two-addend
    // union-sum with the seed teleport — the Spark shape replicated
    // exactly (<= 2 addends per node per round, IEEE-commutative)
    "graph_ppr_seeded" ->
      raw"""WITH $pairsCte,
edges AS (
  SELECT ida AS src, idb AS dst FROM pairs
  UNION ALL SELECT idb AS src, ida AS dst FROM pairs
), dg AS (
  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
), ed AS (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN dg d USING (src)
), seeds AS (
  SELECT DISTINCT src AS id FROM edges WHERE src % 7 = 0
), ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
r0 AS (SELECT id, 1.0 / ns.n AS rank FROM seeds, ns),
r1 AS (
  SELECT id, sum(rank) AS rank FROM (
    SELECT ed.dst AS id, 0.85 * sum(r.rank / ed.deg) AS rank
    FROM ed JOIN r0 r ON r.id = ed.src GROUP BY ed.dst
    UNION ALL
    SELECT id, (1 - 0.85) / ns.n AS rank FROM seeds, ns
  ) GROUP BY id
), r2 AS (
  SELECT id, sum(rank) AS rank FROM (
    SELECT ed.dst AS id, 0.85 * sum(r.rank / ed.deg) AS rank
    FROM ed JOIN r1 r ON r.id = ed.src GROUP BY ed.dst
    UNION ALL
    SELECT id, (1 - 0.85) / ns.n AS rank FROM seeds, ns
  ) GROUP BY id
), r3 AS (
  SELECT id, sum(rank) AS rank FROM (
    SELECT ed.dst AS id, 0.85 * sum(r.rank / ed.deg) AS rank
    FROM ed JOIN r2 r ON r.id = ed.src GROUP BY ed.dst
    UNION ALL
    SELECT id, (1 - 0.85) / ns.n AS rank FROM seeds, ns
  ) GROUP BY id
)
SELECT id AS doc_id, round(rank, 6) AS rank FROM r3 ORDER BY doc_id""",
    "graph_node_stats" ->
      raw"""WITH $pairsCte,
deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT ida AS doc_id FROM pairs
    UNION ALL SELECT idb FROM pairs
  ) GROUP BY doc_id
), tri AS (
  SELECT e1.ida AS a, e1.idb AS b, e2.idb AS c
  FROM pairs e1
  JOIN pairs e2 ON e1.idb = e2.ida
  JOIN pairs e3 ON e3.ida = e1.ida AND e3.idb = e2.idb
), tcount AS (
  SELECT doc_id, count(*) AS n_triangles FROM (
    SELECT a AS doc_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY doc_id
)
SELECT deg.doc_id, deg.degree,
  CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles
FROM deg LEFT JOIN tcount t USING (doc_id)
ORDER BY deg.doc_id""",
    "join_jaro_names" ->
      """WITH probe AS (
  SELECT p_partkey AS qk, p_name AS qn FROM part WHERE p_partkey < 30
), pairs AS (
  SELECT qk, p.p_partkey AS pk,
    round(jaro_winkler_similarity(qn, p.p_name), 6) AS sim
  FROM probe, part p WHERE p.p_partkey <> qk
), ranked AS (
  SELECT qk, pk, sim,
    row_number() OVER (PARTITION BY qk ORDER BY sim DESC, pk) AS rank
  FROM pairs
)
SELECT qk, pk, sim, rank FROM ranked WHERE rank <= 3 ORDER BY qk, rank""",
    "join_fuzzy_probe" ->
      raw"""WITH lt AS (
  SELECT doc_id AS lid, $tokSql AS ws FROM documents
), rt0 AS (
  SELECT doc_id AS rid,
    regexp_replace(text, '^(\S+\s+){5}', '') AS text
  FROM documents WHERE doc_id % 10 = 0
), rt AS (
  SELECT rid, $tokSql AS ws FROM rt0
), lsh AS (
  SELECT lid, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM lt WHERE len(ws) >= 3
), rsh AS (
  SELECT rid, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM rt WHERE len(ws) >= 3
), rex AS (SELECT rid, unnest(shs) AS s FROM rsh),
rdf AS (SELECT s FROM rex GROUP BY s HAVING count(*) <= 100),
lex AS (SELECT lid, unnest(shs) AS s FROM lsh),
cand AS (
  SELECT DISTINCT lid, rid
  FROM lex JOIN (SELECT rid, rex.s FROM rex JOIN rdf USING (s)) r
  USING (s)
)
SELECT cand.lid, cand.rid,
  round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
    (CAST(len(x.shs) AS DOUBLE) + CAST(len(y.shs) AS DOUBLE)
      - CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)), 6) AS jaccard
FROM cand JOIN lsh x ON x.lid = cand.lid JOIN rsh y ON y.rid = cand.rid
WHERE round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
    (CAST(len(x.shs) AS DOUBLE) + CAST(len(y.shs) AS DOUBLE)
      - CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)), 6) >= 0.5
ORDER BY cand.lid, cand.rid""",
    "dedup_chunk_level" ->
      raw"""WITH toks AS (
  SELECT doc_id, $tokSql AS ws FROM documents
), chi AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(ceil(len(ws)/10.0) AS BIGINT))) AS i
  FROM toks WHERE len(ws) > 0
), ch AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
    array_to_string(ws[CAST(i*10+1 AS BIGINT):CAST(i*10+10 AS BIGINT)], ' ')
      AS chunk_text
  FROM chi
), k AS (
  SELECT doc_id, chunk_idx,
    row_number() OVER (PARTITION BY chunk_text
                       ORDER BY doc_id, chunk_idx) = 1 AS keep
  FROM ch
)
SELECT ch.doc_id, count(*) AS n_chunks,
  CAST(coalesce(sum(CASE WHEN k.keep THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_kept,
  coalesce(string_agg(CASE WHEN k.keep THEN ch.chunk_text END,
    ' ' ORDER BY ch.chunk_idx), '') AS dedup_text
FROM ch JOIN k USING (doc_id, chunk_idx)
GROUP BY ch.doc_id
ORDER BY doc_id""",
    "dedup_source_overlap" ->
      raw"""WITH toks AS (
  SELECT source, $tokSql AS ws FROM documents
), sh AS (
  SELECT source, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM toks WHERE len(ws) >= 3
), ss AS (
  SELECT DISTINCT source, unnest(shs) AS s FROM sh
), cnt AS (
  SELECT source, count(*) AS n FROM ss GROUP BY source
)
SELECT x.source AS source_a, y.source AS source_b,
  count(*) AS n_shared,
  round(count(*) * 1.0 / (ca.n + cb.n - count(*)), 6) AS jaccard
FROM ss x JOIN ss y ON x.s = y.s AND x.source < y.source
JOIN cnt ca ON ca.source = x.source
JOIN cnt cb ON cb.source = y.source
GROUP BY x.source, y.source, ca.n, cb.n
ORDER BY source_a, source_b""",
    "dedup_decontaminate" ->
      raw"""WITH toks AS (
  SELECT doc_id, $tokSql AS ws FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(ws) - 1, 1)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
  FROM toks WHERE len(ws) >= 3
), bench AS (
  SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id % 25 = 0
), corp AS (
  SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 25 <> 0
)
SELECT c.doc_id, count(*) AS n_shared
FROM corp c JOIN bench b USING (s)
GROUP BY c.doc_id
HAVING count(*) >= 5
ORDER BY c.doc_id""",
    "dedup_exact_md5" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id,
count(*) AS copies
FROM documents GROUP BY md5(text) ORDER BY digest""",
    "dedup_shingle_jaccard" ->
      raw"""WITH $pairsCte
SELECT ida, idb, jaccard FROM verified WHERE jaccard >= 0.2
ORDER BY ida, idb""",
    // containment = |A∩B| / min(|A|,|B|) over the SAME candidates and
    // shingle sets as the Jaccard verify — integer counts, one rounded
    // division, so the row set is bit-exact cross-engine
    "dedup_containment" ->
      raw"""WITH $pairsCte,
cont AS (
  SELECT ida, idb,
    round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
      least(len(x.shs), len(y.shs)), 6) AS containment
  FROM cand JOIN sh x ON x.doc_id = ida JOIN sh y ON y.doc_id = idb
)
SELECT ida, idb, containment FROM cont WHERE containment >= 0.7
ORDER BY ida, idb""",
    "dedup_blocking_audit" ->
      raw"""WITH $pairsCte
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sh) AS n_docs,
  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
  (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_verified,
  round(1.0 - (SELECT CAST(count(*) AS DOUBLE) FROM cand) /
    ((SELECT CAST(count(*) AS DOUBLE) FROM sh) *
     ((SELECT CAST(count(*) AS BIGINT) FROM sh) - 1) / 2.0), 6)
    AS reduction_ratio,
  round((SELECT CAST(count(*) AS DOUBLE) FROM pairs) /
    (SELECT CAST(count(*) AS DOUBLE) FROM cand), 6) AS pairs_quality""",
    "dedup_components" ->
      raw"""WITH RECURSIVE $compCte
SELECT doc_id, component FROM comp ORDER BY doc_id""",
    "dedup_cluster_sizes" ->
      raw"""WITH RECURSIVE $compCte, sizes AS (
  SELECT component, count(*) AS size FROM comp GROUP BY component
)
SELECT size, count(*) AS n_clusters FROM sizes
GROUP BY size ORDER BY size""",
    "dedup_survivors" ->
      raw"""WITH RECURSIVE $compCte
SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
ORDER BY d.doc_id""",
    "dedup_survivors_quality" ->
      raw"""WITH RECURSIVE $compCte, ql AS (
  ${TextQueries.qualityLogitCteSql}
), lab AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars,
    COALESCE(c.component, d.doc_id) AS component, ql.quality_logit AS q
  FROM documents d
  LEFT JOIN comp c ON d.doc_id = c.doc_id
  JOIN ql ON d.doc_id = ql.doc_id
), ranked AS (
  SELECT doc_id, lang, source, n_chars,
    row_number() OVER (PARTITION BY component
      ORDER BY q DESC, doc_id) AS rn
  FROM lab
)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1
ORDER BY doc_id""")
}
