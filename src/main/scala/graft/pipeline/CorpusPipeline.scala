package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.text.{Stopwords, TextOps}

/** End-to-end training-data preparation: the composition a 100 TB
  * corpus actually runs, built entirely from the engine's operators —
  *
  *   language filter -> quality filter (token count, stopword ratio)
  *   -> exact dedup -> near-dedup survivors (MinHash-LSH + connected
  *   components) -> token accounting
  *
  * Every stage is a DataFrame -> DataFrame transform; `prepare` returns
  * the cleaned corpus and `funnel` the per-stage row counts (the
  * observability a data pipeline needs to explain where documents
  * went).
  */
object CorpusPipeline {

  final case class Config(
    langs: Seq[String] = Seq("en"),
    minTokens: Int = 10,
    maxStopRatio: Double = 0.6,
    dedupThreshold: Double = 0.5)

  private val stopSet = Stopwords.english.toSet

  /** One-pass compiled (token count, stopword count) — semantics
    * identical to counting TextOps.tokens membership in the stopword
    * set, but a single linear scan per document. The declarative
    * formulation (`filter(toks, isin(225 words))`) runs as an
    * interpreted lambda that rescans the stopword list per TOKEN —
    * measured ~3s of the sf0.1 funnel on its own.
    */
  private val tokenStatsUdf = udf { text: String =>
    if (text == null) (0, 0)
    else {
      var n = 0
      var nStop = 0
      val sb = new java.lang.StringBuilder
      var i = 0
      def flush(): Unit = if (sb.length > 0) {
        n += 1
        if (stopSet.contains(sb.toString)) nStop += 1
        sb.setLength(0)
      }
      while (i < text.length) {
        val c = text.charAt(i)
        if (c >= 'a' && c <= 'z') sb.append(c)
        else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
        else flush() // mirrors TextOps.clean: non-letters break tokens
        i += 1
      }
      flush()
      (n, nStop)
    }
  }

  private def withQuality(docs: DataFrame): DataFrame =
    // the UDF lands in its own projection under an alias: CollapseProject
    // refuses to duplicate a non-cheap expression referenced twice, so
    // it runs ONCE per row however many columns read it
    docs
      .withColumn("_q", tokenStatsUdf(col("text")))
      .withColumn("n_tokens", col("_q._1"))
      .withColumn("stop_ratio",
        col("_q._2").cast("double") /
          greatest(col("_q._1"), lit(1)).cast("double"))
      .drop("_q")

  /** The language filter as a row-local predicate — exposed so the
    * streaming funnel can fold its stage count into the batch's one
    * entry aggregation instead of a dedicated filtered count() scan.
    */
  def languagePredicate(cfg: Config): org.apache.spark.sql.Column =
    col("lang").isin(cfg.langs: _*)

  /** The one-pass token-stats struct over a text column — exposed
    * (like [[languagePredicate]]) so the streaming funnel can fold the
    * quality-survivor count into the batch's one entry aggregation.
    * Compute it ONCE per row in a projection (`withColumn`) and read
    * the fields from the alias: CollapseProject refuses to duplicate a
    * non-cheap expression referenced twice, so the UDF runs once per
    * row however many consumers read it.
    */
  def tokenStats(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = tokenStatsUdf(text)

  /** The quality filter as a row-local predicate over a pre-computed
    * [[tokenStats]] struct — the EXACT arithmetic of
    * [[qualityFiltered]] (same int-to-double casts, same greatest
    * guard), so a count of `languagePredicate`-survivors passing this
    * equals `qualityFiltered(languageFiltered(docs)).count()`
    * bit-for-bit. Null-safe: a null struct (language-failed row under
    * a `when(languagePredicate, tokenStats)` projection) yields a null
    * predicate, which a `sum(cast)` fold skips.
    */
  def qualityPredicate(q: org.apache.spark.sql.Column, cfg: Config)
      : org.apache.spark.sql.Column =
    q.getField("_1") >= cfg.minTokens &&
      (q.getField("_2").cast("double") /
        greatest(q.getField("_1"), lit(1)).cast("double")) <=
        cfg.maxStopRatio

  def languageFiltered(docs: DataFrame, cfg: Config): DataFrame =
    docs.where(languagePredicate(cfg))

  def qualityFiltered(docs: DataFrame, cfg: Config): DataFrame =
    withQuality(docs)
      .where(col("n_tokens") >= cfg.minTokens &&
        col("stop_ratio") <= cfg.maxStopRatio)
      .drop("n_tokens", "stop_ratio")

  def exactDeduped(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  def nearDeduped(docs: DataFrame, cfg: Config): DataFrame =
    Dedup.survivors(docs, "doc_id", "text", cfg.dedupThreshold)

  /** The cleaned corpus. */
  def prepare(docs: DataFrame, cfg: Config = Config()): DataFrame =
    nearDeduped(exactDeduped(qualityFiltered(
      languageFiltered(docs, cfg), cfg)), cfg)

  /** Token-budget corpus cap: keep documents in doc_id order until the
    * running token total exceeds `budget` — the "take the first N
    * tokens" step that sizes a training corpus.
    *
    * The cumulative sum is a DISTRIBUTED prefix sum, not a global
    * window (a `Window.orderBy` with no partition keys funnels the
    * whole corpus through ONE reducer): docs bucket by id range,
    * per-bucket sums aggregate map-side, the tiny bucket table's
    * offsets come from [[graft.operators.BoundedPrefix]] (driver scan,
    * zipWithIndex-style), and the within-bucket cumsum runs
    * partitioned by bucket. Every shuffle is bounded; the only ordered
    * structure is the bucket table (#buckets rows). The tokenized
    * projection is checkpointed so the offset pass and the readout
    * share one tokenization scan.
    */
  def tokenBudgetSample(docs: DataFrame, budget: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = docs.select(
      col("doc_id"),
      tokenStatsUdf(col("text")).getField("_1").cast("long").as("n_tokens"),
      (col("doc_id") / bucketWidth).cast("long").as("_b"))
      .localCheckpoint(true)
    val offsets = graft.operators.BoundedPrefix.offsets(
      withTok.groupBy("_b").agg(sum("n_tokens").as("_bt")),
      Nil, Seq("_b"), Seq("_bt" -> "_off"))
      .select("_b", "_off")
    withTok
      .join(broadcast(offsets), "_b")
      .withColumn("cum_tokens",
        col("_off") + sum("n_tokens").over(
          Window.partitionBy("_b").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
  }

  /** Per-source token budgets (domain allocation): each source keeps
    * its first documents (in id order) up to ITS token cap — the
    * "×B tokens of web, ×B of code, ×B of papers" corpus-assembly
    * step. The prefix sum runs PARTITIONED BY SOURCE: per-(source,
    * bucket) partials, a window over the tiny bucket table keyed by
    * source, broadcast join back — the global-window anti-pattern
    * never appears, and adding a source adds rows to the bucket table,
    * not a new job.
    */
  def tokenBudgetPerSource(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long, bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(col("source") === s, lit(b)).otherwise(acc)
    }
    val withTok = docs.select(
      col("doc_id"), col("source"),
      tokenStatsUdf(col("text")).getField("_1").cast("long").as("n_tokens"),
      (col("doc_id") / bucketWidth).cast("long").as("_b"))
    val offsets = withTok
      .groupBy("source", "_b").agg(sum("n_tokens").as("_bt"))
      .withColumn("_off",
        coalesce(sum("_bt").over(
          Window.partitionBy("source").orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("source", "_b", "_off")
    withTok
      .join(broadcast(offsets), Seq("source", "_b"))
      .withColumn("cum_tokens",
        (col("_off") + sum("n_tokens").over(
          Window.partitionBy("source", "_b").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .where(col("cum_tokens") <= budgetCol)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** Sequence packing (concat-then-split pretraining layout): documents
    * in id order are laid head-to-tail on a global token axis; the
    * training sequence a document STARTS in is
    * `floor(start_offset / seqLen)`. Emits one row per doc with its
    * global offset and pack id — the writer that actually concatenates
    * bytes can then `repartition(pack_id)` and build each sequence
    * locally.
    *
    * Same distributed prefix sum as [[tokenBudgetSample]]: no global
    * single-reducer window at any scale; the only ordered structure is
    * the per-bucket offset table (corpus_size / bucketWidth rows).
    */
  def packSequences(docs: DataFrame, seqLen: Long,
      bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withTok = docs.select(
      col("doc_id"),
      tokenStatsUdf(col("text")).getField("_1").cast("long").as("n_tokens"),
      (col("doc_id") / bucketWidth).cast("long").as("_b"))
      .localCheckpoint(true)
    val offsets = graft.operators.BoundedPrefix.offsets(
      withTok.groupBy("_b").agg(sum("n_tokens").as("_bt")),
      Nil, Seq("_b"), Seq("_bt" -> "_off"))
      .select("_b", "_off")
    withTok
      .join(broadcast(offsets), "_b")
      .withColumn("start_offset",
        (col("_off") + coalesce(sum("n_tokens").over(
          Window.partitionBy("_b").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .cast("long"))
      .withColumn("pack_id",
        floor(col("start_offset") / lit(seqLen.toDouble)).cast("long"))
      .select("doc_id", "n_tokens", "start_offset", "pack_id")
  }

  /** Contiguous 0-based global ids in (source, doc_id) order WITHOUT a
    * global sort — the stable example numbering a training run needs
    * for reproducible shuffling, checkpoint resume and sample
    * addressing (`row_number() OVER (ORDER BY ...)` computes the same
    * thing through ONE reducer; this is the distributed prefix-sum
    * form: per-(source, bucket) counts, driver-scanned offsets over
    * the tiny bucket table, within-bucket row_number). Ids are dense:
    * 0..n-1 with no
    * gaps, unlike monotonically_increasing_id whose values jump per
    * partition.
    */
  def stableIds(docs: DataFrame, bucketWidth: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = docs.select(col("doc_id"), col("source"),
      (col("doc_id") / bucketWidth).cast("long").as("_b"))
      .localCheckpoint(true)
    val offsets = graft.operators.BoundedPrefix.offsets(
      bucketed.groupBy("source", "_b").agg(count(lit(1)).as("_c")),
      Nil, Seq("source", "_b"), Seq("_c" -> "_off"))
      .select("source", "_b", "_off")
    bucketed
      .join(broadcast(offsets), Seq("source", "_b"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("source", "_b").orderBy("doc_id")).cast("long"))
      .select(col("doc_id"), col("source"),
        (col("_off") + col("_rn") - 1).as("stable_id"))
  }

  /** Exact-proportion stratified train/val/test split: within every
    * (lang, source) stratum, documents rank by (md5(doc_id), doc_id)
    * — content-addressed, layout-independent — and the first
    * floor(n*trainPct) go to train, the next floor(n*(trainPct+valPct))
    * boundary to val, the rest to test. Unlike hash-threshold splits
    * (pipeline_hash_split), proportions are EXACT per stratum,
    * which is what a small-stratum eval set needs (a 1% hash split of
    * a 300-doc language can easily be empty).
    *
    * Scale shape: the per-stratum rank is the distributed prefix-sum
    * pattern again — buckets are the first two hex chars of the hash
    * (256 per stratum, hash-ordered, so bucket order IS rank order),
    * per-(stratum, bucket) counts aggregate map-side, the only
    * ordered window runs over that tiny bucket table, and the
    * within-bucket row_number is partitioned by (stratum, bucket).
    * No corpus-wide single-reducer window at any size.
    */
  def stratifiedSplit(docs: DataFrame, trainPct: Double = 0.8,
      valPct: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("doc_id").cast("string"))
    val bucketed = docs.select(col("doc_id"), col("lang"), col("source"),
      h.as("_h"), substring(h, 1, 2).as("_b"))
    val counts = bucketed.groupBy("lang", "source", "_b")
      .agg(count(lit(1)).as("_c"))
    val offsets = counts
      .withColumn("_off",
        coalesce(sum("_c").over(
          Window.partitionBy("lang", "source").orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n",
        sum("_c").over(Window.partitionBy("lang", "source")))
      .select("lang", "source", "_b", "_off", "_n")
    bucketed
      .join(broadcast(offsets), Seq("lang", "source", "_b"))
      .withColumn("_r",
        col("_off") + row_number().over(
          Window.partitionBy("lang", "source", "_b").orderBy("_h", "doc_id"))
          .cast("long"))
      .withColumn("split",
        when(col("_r") <= floor(col("_n") * trainPct), "train")
          .when(col("_r") <= floor(col("_n") * (trainPct + valPct)), "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "split")
  }

  /** Sliding context windows: each document's token sequence cut into
    * overlapping windows of `size` tokens every `stride` tokens — the
    * long-document layout for models with a bounded context (each
    * window overlaps the previous by size - stride tokens so no span
    * is ever seen without context). Purely row-local: one generator
    * (posexplode over the window starts) per document, no shuffle at
    * any corpus size; window count is ceil(n / stride) so output is
    * ~n/stride rows per doc. Emits (doc_id, win_idx, n_win_tokens,
    * win_text).
    */
  def contextWindows(docs: DataFrame, winSize: Int, stride: Int): DataFrame = {
    require(winSize > 0 && stride > 0 && stride <= winSize,
      s"need 0 < stride <= winSize (got winSize=$winSize stride=$stride)")
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("_t"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, cast(floor((size(_t) - 1) / $stride) as int)), " +
            s"i -> slice(_t, i * $stride + 1, $winSize))")))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("win_idx"),
        size(col("col")).cast("long").as("n_win_tokens"),
        array_join(col("col"), " ").as("win_text"))
  }

  /** Deterministic domain-mixture sampling: per-source keep percentages
    * applied via a doc_id modulus (systematic sampling — reproducible
    * across runs, retries and engines; no RNG state to ship). The
    * standard corpus-assembly step that up/down-weights sources toward
    * a target mixture. Unlisted sources keep `defaultPct`%.
    */
  def mixtureSample(docs: DataFrame, pct: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    val rate = pct.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    docs.where(pmod(col("doc_id"), lit(100)) < rate)
  }

  /** `prepare` with free per-stage counters: `Observation` metrics ride
    * the materializing job itself, so the language/quality/exact-dedup
    * frontier counts cost ZERO extra scans — `funnel` pays a dedicated
    * aggregation pass over the raw corpus; at 100 TB that pass is the
    * difference between "metrics" and "metrics doubled my input I/O".
    * The near-dedup stage count is read from the OUTPUT observation, so
    * the whole report needs only the action the caller was already
    * going to run.
    *
    * Returns the cleaned corpus and a thunk yielding the stage map;
    * call it AFTER an action has materialized the frame (Observation
    * blocks until its subtree has executed once).
    */
  def prepareObserved(docs: DataFrame, cfg: Config = Config())
      : (DataFrame, () => Map[String, Long]) = {
    import org.apache.spark.sql.Observation
    val oIn = Observation(); val oLang = Observation()
    val oQual = Observation(); val oExact = Observation()
    val oNear = Observation()
    val lang = languageFiltered(
      docs.observe(oIn, count(lit(1)).as("n")), cfg)
    val qual = qualityFiltered(
      lang.observe(oLang, count(lit(1)).as("n")), cfg)
    val exact = exactDeduped(
      qual.observe(oQual, count(lit(1)).as("n")))
    val near = nearDeduped(
      exact.observe(oExact, count(lit(1)).as("n")), cfg)
      .observe(oNear, count(lit(1)).as("n"))
    val read = (o: Observation) => o.get("n").asInstanceOf[Long]
    (near, () => Map(
      "1_input" -> read(oIn),
      "2_language" -> read(oLang),
      "3_quality" -> read(oQual),
      "4_exact_dedup" -> read(oExact),
      "5_near_dedup" -> read(oNear)))
  }

  /** Stage funnel: rows surviving each stage plus the token budget of
    * the final corpus.
    *
    * Stages 1-4 are counted in ONE aggregation job over the raw scan:
    * language and quality are row-local flags, and the exact-dedup
    * count is `count(DISTINCT digest)` over the surviving rows — no
    * per-stage re-scan, no caching of intermediate frontiers. Only the
    * near-dedup stage (pair graph + clustering) needs real extra jobs.
    */
  def funnel(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langOk = col("lang").isin(cfg.langs: _*)
    val qualOk = langOk && col("_q._1") >= cfg.minTokens &&
      (col("_q._2").cast("double") /
        greatest(col("_q._1"), lit(1)).cast("double")) <= cfg.maxStopRatio
    val head = docs
      .select(col("text"), col("lang"), tokenStatsUdf(col("text")).as("_q"))
      .agg(
        count(lit(1)).as("n_input"),
        coalesce(sum(langOk.cast("long")), lit(0L)).as("n_lang"),
        coalesce(sum(qualOk.cast("long")), lit(0L)).as("n_quality"),
        countDistinct(when(qualOk, md5(col("text")))).as("n_exact"))
      .collect()(0)
    val exact = exactDeduped(qualityFiltered(
      languageFiltered(docs, cfg), cfg)).persist()
    val near = nearDeduped(exact, cfg)
    val Array(nearCount, tokenBudget) = near
      .agg(count(lit(1)),
        sum(tokenStatsUdf(col("text")).getField("_1").cast("long")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val out = Seq(
      ("1_input", head.getLong(0), 0L),
      ("2_language", head.getLong(1), 0L),
      ("3_quality", head.getLong(2), 0L),
      ("4_exact_dedup", head.getLong(3), 0L),
      ("5_near_dedup", nearCount, tokenBudget))
      .toDF("stage", "n_docs", "total_tokens")
    exact.unpersist()
    out
  }

  /** `funnel` semantics at one-action cost: the stage counters ride
    * the near-dedup materialization itself (`prepareObserved`), so the
    * raw corpus is never re-scanned for metrics and no intermediate
    * frontier is cached — at 100 TB the dedicated metric pass and the
    * full-corpus persist are both real costs this variant deletes.
    * Verified row-for-row identical to `funnel` in CorpusPipelineSpec.
    */
  def funnelObserved(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (near, metrics) = prepareObserved(docs, cfg)
    val row = near
      .agg(count(lit(1)),
        sum(tokenStatsUdf(col("text")).getField("_1").cast("long")))
      .collect()(0)
    val (nearCount, tokenBudget) = (row.getLong(0), row.getLong(1))
    val m = metrics()
    Seq(
      ("1_input", m("1_input"), 0L),
      ("2_language", m("2_language"), 0L),
      ("3_quality", m("3_quality"), 0L),
      ("4_exact_dedup", m("4_exact_dedup"), 0L),
      ("5_near_dedup", nearCount, tokenBudget))
      .toDF("stage", "n_docs", "total_tokens")
  }
}
