package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.KeywordPipeline

/** Reference-parity keyword pipeline registered for the driver dump.
  * Lemmatization/POS are dictionary-backed Scala UDFs with no ANSI-SQL
  * equivalent, so these get rows-only driver checks; exact behavior is
  * pinned by KeywordPipelineSpec (golden README output).
  */
object PipelineQueries {

  /** v2 POS-aware lemmatized keyword frequency over the corpus. */
  def keywordsV2TopK(spark: SparkSession, dir: String): DataFrame =
    KeywordPipeline.keywordTableV2(
        Tables(spark, dir, "documents"), "doc_id", "text", lit(2024))
      .groupBy("keyword")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("keyword"))
      .limit(100)

  /** The reference's golden example (README.md:4-17) end-to-end as a
    * query: the v1 inverted index of the golden abstract. Expected: 7
    * rows (article/review/different/publication/breast/cancer/man).
    */
  def pubmedGoldenV1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      (123456L, "This article is a review of the different publications " +
        "on breast cancer in men.")).toDF("pmid", "abstract")
    KeywordPipeline.invertedIndexV1(docs, "pmid", "abstract")
      .orderBy("word")
  }

  /** DSIR importance weights over the corpus: target = the English
    * slice, raw = everything; every doc scored by how target-like its
    * hashed-unigram distribution is ([[graft.operators.Dsir]]). The
    * md5-bucket hash is cross-engine, so this is fully oracle-checked.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceWeights(
        Tables(spark, dir, "documents"), col("lang") === "en", m = 64)
      .orderBy("doc_id")

  /** Deterministic per-epoch training order: every epoch reshuffles
    * the corpus by ranking on a seedless per-epoch hash — reproducible
    * across runs/engines with no RNG state, and every epoch's order is
    * independent (the "reshuffle each epoch" contract). The global
    * rank is assembled WITHOUT a global sort: hash-prefix buckets,
    * per-(epoch, bucket) counts, an offset window over the tiny bucket
    * table (partitioned by epoch), and a within-bucket row_number —
    * the same distributed prefix-sum discipline as stable_ids, with
    * the hash itself as the order key.
    */
  def epochOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("ep"), col("epoch"), lit(":"), col("doc_id")))
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(sequence(lit(0), lit(1))).as("epoch"))
      .select(col("doc_id"), col("epoch").cast("long").as("epoch"))
      .withColumn("_h", h)
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10)
        .cast("long"))
      .localCheckpoint(true) // offsets + rank share one evaluation
    val off = docs.groupBy("epoch", "_b").agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum("_c").over(
        Window.partitionBy("epoch").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("epoch", "_b", "_off")
    docs.join(broadcast(off), Seq("epoch", "_b"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("epoch", "_b")
          .orderBy(col("_h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("epoch"),
        (col("_off") + col("_rn") - 1).as("pos"))
      .orderBy("epoch", "pos")
  }

  /** The full training-data preparation funnel over the corpus. The
    * observed variant: counters ride the materializing job, no
    * dedicated metric scan, no persist (funnel() is the independent
    * cross-check in CorpusPipelineSpec).
    */
  def corpusFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.funnelObserved(Tables(spark, dir, "documents"))

  /** Token-budget cap: first documents (in id order) whose running
    * token total fits 10k tokens — distributed prefix sum inside,
    * plain window cumsum as the oracle.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.tokenBudgetSample(
        Tables(spark, dir, "documents"), budget = 10000L)
      .orderBy("doc_id")

  /** Sequence packing: every doc's global token offset and the 512-token
    * training sequence it starts in (concat-then-split layout).
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.packSequences(
        Tables(spark, dir, "documents"), seqLen = 512L)
      .orderBy("doc_id")

  /** Per-source token caps: src0 gets 2000 tokens, src1 1000,
    * everything else 500 — the domain-allocation step.
    */
  def sourceBudget(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.tokenBudgetPerSource(
        Tables(spark, dir, "documents"),
        Map("src0" -> 2000L, "src1" -> 1000L), defaultBudget = 500L)
      .orderBy("doc_id")

  /** Per-source data card — the one-pass reporting aggregate every
    * corpus release ships (docs, language breadth, char/token volume,
    * length profile, short-doc fraction). ONE scan, one hash agg keyed
    * by source (the distinct-lang count expands the agg, still
    * single-pass); token counts are row-local array sizes, so the
    * exchange is #sources rows. Fully oracle-checked.
    */
  def sourceCard(spark: SparkSession, dir: String): DataFrame = {
    val nt = size(graft.text.TextOps.tokens(col("text"))).cast("long")
    Tables(spark, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"), nt.as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        sum("n_chars").as("total_chars"),
        sum("nt").as("total_tokens"),
        round(avg("nt"), 4).as("avg_tokens"),
        round(avg(when(col("nt") < 30, 1.0).otherwise(0.0)), 4)
          .as("frac_short"),
        max("nt").as("max_tokens"))
      .orderBy("source")
  }

  /** Deterministic content-hash train/val/test split: the first hex
    * nibble of md5(text) buckets docs 12/2/2 — reproducible across
    * engines, runs, and retries; content-keyed so exact dups always
    * land in the same split (no eval leakage after dedup).
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val nibble = substring(md5(col("text")), 1, 1)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        when(nibble.isin("e", "f"), "test")
          .when(nibble.isin("c", "d"), "val")
          .otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Exact-proportion stratified split
    * ([[graft.pipeline.CorpusPipeline.stratifiedSplit]]): 80/10/10
    * within every (lang, source) stratum, readout as per-stratum split
    * counts plus an id checksum so the oracle pins the per-document
    * assignment, not just the counts.
    */
  def stratifiedSplit(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.stratifiedSplit(
        Tables(spark, dir, "documents"))
      .groupBy("lang", "source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("lang", "source", "split")

  /** Domain-mixture sampling: src0 kept whole, src1 halved, src2 cut
    * to 10%, everything else 25% — per-source counts after the cut.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.mixtureSample(
        Tables(spark, dir, "documents"),
        Map("src0" -> 100, "src1" -> 50, "src2" -> 10), defaultPct = 25)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("source")

  /** Temperature-scaled source-mixture weights (the multilingual-
    * corpus sampling recipe: raw size share p_i flattened to
    * p_i^α / Σ p_j^α so small sources are up-weighted without letting
    * any source dominate). α = 0.5, so the power is `sqrt` — correctly
    * rounded IEEE in both engines, keeping the oracle bit-exact where
    * a libm `pow` would risk last-ulp drift. `boost` is the resulting
    * up/down-sampling factor a sampler (e.g. [[mixtureSample]]) would
    * apply per source. Shape: one hash agg over the corpus; the
    * normalizing totals are single-row aggregates of the GROUPED table
    * (rows = #sources, a bounded dimension — never corpus-wide)
    * cross-joined back as broadcast literals — no global-window stage.
    */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .localCheckpoint(true) // totals + readout share one corpus agg
    val totChars = src.agg(sum("n_chars").as("_tc"))
    val withW = src.crossJoin(broadcast(totChars))
      .withColumn("p_raw", col("n_chars") / col("_tc"))
      .withColumn("w", sqrt(col("p_raw")))
    val totW = withW.agg(sum("w").as("_tw"))
    withW.crossJoin(broadcast(totW))
      .select(col("source"), col("n_docs"), col("n_chars"),
        round(col("p_raw"), 6).as("p_raw"),
        round(col("w") / col("_tw"), 6).as("p_temp"),
        round(col("w") / col("_tw") / col("p_raw"), 6).as("boost"))
      .orderBy("source")
  }

  /** Sliding context windows (size 16, stride 8): the long-document
    * layout step — overlapping token windows so a bounded-context
    * model never sees a span without its left context. Row-local
    * generator, no shuffle at any scale.
    */
  def contextWindows(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.contextWindows(
        Tables(spark, dir, "documents"), winSize = 16, stride = 8)
      .orderBy("doc_id", "win_idx")

  /** Deterministic source-interleaved training order: position =
    * (rank within source) * n_sources + source index — round-robin
    * across domains so no training window sees one domain in a block.
    * Scale shape: one per-source window (rank), a BROADCAST join to
    * the tiny source-index dimension, and row-local position
    * arithmetic — the global order is never materialized by a
    * single-reducer sort; a writer would repartitionByRange(pos) to
    * lay files out in training order.
    */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    // The source dimension is bounded; index it with one driver sort
    // (the dense_rank-over-everything form costs a single-reducer
    // window stage for the same bounded table).
    val srcs = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val srcIdx = spark.createDataFrame(
      srcs.toIndexedSeq.zipWithIndex.map { case (s, i) => (s, i.toLong) })
      .toDF("source", "src_idx")
    val nSrc = srcs.length.toLong
    docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")).cast("long"))
      .join(broadcast(srcIdx), "source")
      .select(col("doc_id"), col("source"),
        ((col("rn") - 1) * lit(nSrc) + col("src_idx")).as("pos"))
      .orderBy("pos")
  }

  /** Dense 0-based example ids in (source, doc_id) order via the
    * distributed prefix sum — never a single-reducer global
    * row_number; the oracle IS that single-reducer form.
    */
  def stableIds(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.CorpusPipeline.stableIds(Tables(spark, dir, "documents"))
      .orderBy("stable_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_stable_ids" -> stableIds,
    "pipeline_interleave" -> interleave,
    "pipeline_context_windows" -> contextWindows,
    "pipeline_keywords_v2_topk" -> keywordsV2TopK,
    "pipeline_pubmed_golden_v1" -> pubmedGoldenV1,
    "pipeline_corpus_funnel" -> corpusFunnel,
    "pipeline_token_budget" -> tokenBudget,
    "pipeline_pack_sequences" -> packSequences,
    "pipeline_hash_split" -> hashSplit,
    "pipeline_stratified_split" -> stratifiedSplit,
    "pipeline_source_budget" -> sourceBudget,
    "pipeline_source_card" -> sourceCard,
    "pipeline_mixture_sample" -> mixtureSample,
    "pipeline_mixture_temperature" -> mixtureTemperature,
    "pipeline_dsir_weights" -> dsirWeights,
    "pipeline_epoch_order" -> epochOrder)

  private val tokSql =
    raw"""CAST(len(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '')) AS BIGINT)"""

  val oracle: Map[String, String] = Map(
    // round-7 conversions: POS-tag + lemmatize replayed rule-for-rule
    // in SQL — see LemmaOracle for the machinery
    "pipeline_keywords_v2_topk" -> LemmaOracle.keywordsV2TopK,
    "pipeline_pubmed_golden_v1" -> LemmaOracle.pubmedGoldenV1,
    "pipeline_corpus_funnel" -> MinHashOracle.corpusFunnel,
    "pipeline_source_card" ->
      raw"""WITH d AS (
  SELECT source, lang, n_chars, $tokSql AS nt FROM documents
)
SELECT source, count(*) AS n_docs,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(nt) AS BIGINT) AS total_tokens,
  round(avg(nt), 4) AS avg_tokens,
  round(avg(CASE WHEN nt < 30 THEN 1.0 ELSE 0.0 END), 4) AS frac_short,
  CAST(max(nt) AS BIGINT) AS max_tokens
FROM d GROUP BY source ORDER BY source""",
    "pipeline_epoch_order" ->
      """SELECT doc_id, epoch,
  CAST(row_number() OVER (PARTITION BY epoch
    ORDER BY md5('ep' || epoch || ':' || doc_id), doc_id) - 1 AS BIGINT)
    AS pos
FROM documents, (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS epoch)
ORDER BY epoch, pos""",
    "pipeline_dsir_weights" ->
      raw"""WITH tok AS (
  SELECT doc_id, lang = 'en' AS t,
    unnest(list_filter(string_split_regex(lower(regexp_replace(text,
      '[^a-zA-Z ]', ' ', 'g')), '\s+'), w -> w <> '')) AS w
  FROM documents
), docb AS (
  SELECT doc_id, t,
    CAST('0x' || substr(md5(w), 1, 7) AS BIGINT) % 64 AS bucket,
    CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 1, 2, 3
), perb AS (
  SELECT bucket, sum(CASE WHEN t THEN n ELSE 0 END) AS ct, sum(n) AS cr
  FROM docb GROUP BY 1
), tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM perb),
lr AS (
  SELECT bucket,
    ln((ct + 1.0) / (tt + 64.0)) - ln((cr + 1.0) / (tr + 64.0)) AS lr
  FROM perb, tot
)
SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_tokens,
  round(sum(d.n * lr.lr), 4) AS logw
FROM docb d JOIN lr USING (bucket)
GROUP BY d.doc_id ORDER BY d.doc_id""",
    "pipeline_stable_ids" ->
      """SELECT doc_id, source,
  CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
    AS stable_id
FROM documents ORDER BY stable_id""",
    "pipeline_interleave" ->
      """WITH s AS (
  SELECT source,
    CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT) AS src_idx
  FROM (SELECT DISTINCT source FROM documents)
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM s),
r AS (
  SELECT doc_id, source,
    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
      AS BIGINT) AS rn
  FROM documents
)
SELECT r.doc_id, r.source, (r.rn - 1) * n.n_src + s.src_idx AS pos
FROM r JOIN s USING (source), n
ORDER BY pos""",
    "pipeline_context_windows" ->
      raw"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), wi AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(floor((len(ws) - 1) / 8) AS BIGINT) + 1)) AS i
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS win_idx,
  CAST(len(ws[CAST(i*8+1 AS BIGINT):CAST(i*8+16 AS BIGINT)]) AS BIGINT)
    AS n_win_tokens,
  array_to_string(ws[CAST(i*8+1 AS BIGINT):CAST(i*8+16 AS BIGINT)], ' ')
    AS win_text
FROM wi ORDER BY doc_id, win_idx""",
    "pipeline_token_budget" ->
      raw"""WITH t AS (
  SELECT doc_id, $tokSql AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= 10000 ORDER BY doc_id""",
    "pipeline_pack_sequences" ->
      raw"""WITH t AS (
  SELECT doc_id, $tokSql AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
  CAST(floor(start_offset / 512.0) AS BIGINT) AS pack_id
FROM c ORDER BY doc_id""",
    "pipeline_source_budget" ->
      raw"""WITH t AS (
  SELECT doc_id, source, $tokSql AS n_tokens FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= CASE source
  WHEN 'src0' THEN 2000 WHEN 'src1' THEN 1000 ELSE 500 END
ORDER BY doc_id""",
    "pipeline_hash_split" ->
      """SELECT doc_id,
CASE WHEN substr(md5(text), 1, 1) IN ('e', 'f') THEN 'test'
     WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
     ELSE 'train' END AS split
FROM documents ORDER BY doc_id""",
    "pipeline_stratified_split" ->
      """WITH ranked AS (
  SELECT doc_id, lang, source,
    row_number() OVER (PARTITION BY lang, source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
    count(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
), assigned AS (
  SELECT doc_id, lang, source,
    CASE WHEN r <= floor(n * 0.8) THEN 'train'
         -- (0.8 + 0.1) not 0.9: the engine adds the two pcts in
         -- IEEE double, one ulp above the 0.9 literal
         WHEN r <= floor(n * (0.8 + 0.1)) THEN 'val'
         ELSE 'test' END AS split
  FROM ranked
)
SELECT lang, source, split, count(*) AS n_docs,
  CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM assigned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "pipeline_mixture_sample" ->
      """SELECT source, count(*) AS n_docs,
CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id % 100 < CASE source
  WHEN 'src0' THEN 100 WHEN 'src1' THEN 50 WHEN 'src2' THEN 10
  ELSE 25 END
GROUP BY source ORDER BY source""",
    "pipeline_mixture_temperature" ->
      """WITH s AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source),
t AS (
  SELECT source, n_docs, n_chars,
    n_chars / (sum(n_chars) OVER () * 1.0) AS p_raw,
    sqrt(n_chars / (sum(n_chars) OVER () * 1.0)) AS w
  FROM s)
SELECT source, n_docs, n_chars, round(p_raw, 6) AS p_raw,
  round(w / sum(w) OVER (), 6) AS p_temp,
  round(w / sum(w) OVER () / p_raw, 6) AS boost
FROM t ORDER BY source""")
}
