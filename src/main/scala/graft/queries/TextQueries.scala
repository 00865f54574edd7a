package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Stopwords, TextOps}

/** Text-analysis queries over the `documents` table — the reference's
  * keyword pipeline (SURVEY.md §2.1 O13-O21) generalized to a corpus
  * table, plus quality/token statistics a training-data pipeline needs.
  *
  * Scale posture: every query is scan -> narrow per-row array ops ->
  * single hash aggregation. The only shuffle is the final groupBy; the
  * per-document distinct happens BEFORE explode so the exchange carries
  * distinct (doc, word) pairs, not raw token multiplicity.
  */
object TextQueries {

  private val stop = Stopwords.english
  private val stopSql = Stopwords.sqlInList(stop)

  /** ONE tokenize pass for the whole text family (r15, VERDICT r14
    * task 5): the (doc_id, ws) token table, checkpointed once per
    * (session, dir) and shared by every query whose tokenizer is
    * exactly [[TextOps.tokens]] over `documents.text` — tf-idf,
    * unigram/trigram logprob, PMI, Zipf, trigram novelty, hashed
    * features, the ULM encode join, the line table and the BM25 base.
    * At corpus scale tokenization IS the dominant cost of these
    * queries; here each re-ran it per query. Token arrays are
    * identical to inline tokenization by construction, so results are
    * unchanged — the memo changes cost, never content (the
    * bm25Base/trigramCache discipline: session-scoped, bounded,
    * nothing persists across JVMs). Queries that need more than
    * (doc_id, tokens) — raw text, lang/source — keep their own scans.
    */
  private val tokenCache =
    new graft.SessionMemo[DataFrame](8)(graft.SessionMemo.free)
  private[queries] def tokenized(spark: SparkSession, dir: String)
      : DataFrame =
    tokenCache.getOrElseUpdate(spark, dir) {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
        .localCheckpoint(true)
    }

  /** Flagship: corpus keyword frequency, top 100. The reference's
    * "inverted keyword index" (word_count.py:63-65) + the count its
    * README name promises, as one declarative plan.
    */
  def keywordTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs
      .select(explode(TextOps.keywords(col("text"), stop)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(100)
  }

  /** Inverted index (word -> doc), the reference's exact v1 output shape
    * (word_count.py:63-65) on the harness corpus. Kept unaggregated to
    * exercise generator + projection; deterministic via sort keys in the
    * oracle comparison (driver sorts rows).
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs.select(
      explode(TextOps.keywords(col("text"), stop)).as("word"),
      col("doc_id"))
  }

  /** Per-document quality statistics: token counts, stopword ratio,
    * mean token length — the "quality scoring" text-analysis operator.
    */
  def qualityStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val toks = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      col("n_chars"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
      size(TextOps.distinctTokens(col("text"))).cast("long").as("n_distinct"),
      size(filter(toks, t => t.isin(stop.map(s => s: Any): _*)))
        .cast("long").as("n_stop"),
      round(
        size(filter(toks, t => t.isin(stop.map(s => s: Any): _*))).cast("double") /
          greatest(TextOps.tokenCount(col("text")), lit(1)).cast("double"),
        4).as("stop_ratio"))
  }

  /** Multi-signal quality blend: per-doc signals standardized against
    * corpus statistics and averaged into ONE rank score — the "combine
    * length, diversity and stopword evidence into a single filter
    * column" step (z-score normalization, not percent_rank, precisely
    * because ranking would need a corpus-wide partition-less window;
    * the mean/stddev pair is one hash agg + a broadcast of 6 scalars).
    * Float-parity discipline: signals are exact (integer counts and
    * integer-ratio divisions), corpus stats are rounded to 6 BEFORE
    * standardizing, so the per-row z arithmetic is identical IEEE ops
    * on identical operands in both engines.
    */
  def qualityBlend(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val toks = TextOps.tokens(col("text"))
    val nTok = TextOps.tokenCount(col("text")).cast("double")
    val sig = docs.select(
      col("doc_id"),
      nTok.as("s_len"),
      (size(TextOps.distinctTokens(col("text"))).cast("double") /
        greatest(nTok, lit(1.0))).as("s_div"),
      (size(filter(toks, t => t.isin(stop.map(s => s: Any): _*)))
        .cast("double") / greatest(nTok, lit(1.0))).as("s_stop"))
    val st = sig.agg(
      round(avg("s_len"), 6).as("m_len"), round(stddev("s_len"), 6).as("d_len"),
      round(avg("s_div"), 6).as("m_div"), round(stddev("s_div"), 6).as("d_div"),
      round(avg("s_stop"), 6).as("m_stop"), round(stddev("s_stop"), 6).as("d_stop"))
    val z = (s: String) => (col(s"s_$s") - col(s"m_$s")) / col(s"d_$s")
    sig.crossJoin(broadcast(st))
      .select(col("doc_id"),
        round(z("len"), 4).as("z_len"),
        round(z("div"), 4).as("z_div"),
        round(z("stop"), 4).as("z_stop"),
        round((z("len") + z("div") + z("stop")) / 3.0, 4).as("blend"))
      .orderBy("doc_id")
  }

  /** Corpus statistics grouped by language. */
  def langStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** Token counting per source: whitespace tokens and BPE-ish subword
    * units (both codegen'd regex built-ins, no UDF).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    docs
      .groupBy("source")
      .agg(
        sum(TextOps.tokenCount(col("text")).cast("long")).as("ws_tokens"),
        sum(TextOps.bpeishCount(col("text")).cast("long")).as("bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** Gopher-style repetition rules: duplicate/most-common bigram
    * fractions + word-count/word-length bands, with a keep flag.
    */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame =
    graft.text.QualityRules.repetitionStats(
        Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Unigram log-probability scoring (the CCNet-style LM-perplexity
    * proxy): corpus unigram frequencies -> per-document mean token
    * log-prob. Two hash aggs + one equi-join on the word key; the
    * corpus total is ONE collected scalar. No broadcast hint on the
    * frequency table — a web-scale vocabulary is not small, and AQE
    * broadcasts when it actually is.
    */
  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    // barrier on the word key: the token table comes from the shared
    // family memo (tokenized ONCE per session+dir) and both consumers
    // (frequency agg + probability join) read the same reused, already
    // co-partitioned exchange
    val tok = tokenized(spark, dir)
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .repartition(col("word"))
    val freq = tok.groupBy("word").agg(count(lit(1)).as("c"))
    // corpus token total == sum of freq counts, but computed as ONE
    // row-local scan (sum of per-doc token counts) over the memoized
    // token table — the freq-side formulation re-ran the whole
    // explode+shuffle as a separate job just to produce this scalar
    // (round-11 tail shave, TIMEONE.md); r15 drops its re-tokenize too
    val total = tokenized(spark, dir)
      .agg(sum(size(col("ws")).cast("long")))
      .collect()(0).getLong(0)
    tok.join(freq, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double") / lit(total.toDouble))), 4)
          .as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Trigram stupid-backoff LM scoring ([[graft.operators.NgramLm]]):
    * train on the even-doc_id half of the corpus, score the odd half —
    * a real held-out split, so every backoff level (trigram hit,
    * bigram backoff, add-one unigram floor) genuinely fires. One
    * tokenize pass checkpointed and shared by both halves; scoring
    * joins run over distinct trigram TYPES, never token events.
    */
  def trigramLogprob(spark: SparkSession, dir: String): DataFrame =
    trigramScored(spark, dir)

  /** The held-out trigram score table, trained once per (session, dir)
    * and shared by [[trigramLogprob]] and [[perplexityBuckets]] — the
    * LM build is the expensive part and both queries consume the SAME
    * deterministic scores, so the memo changes cost, never content.
    * The checkpoint also serves as the multi-consumer barrier
    * (exactNtile reads its input in three subtrees).
    */
  private val trigramCache =
    new graft.SessionMemo[DataFrame](8)(graft.SessionMemo.free)
  private def trigramScored(spark: SparkSession, dir: String): DataFrame =
    trigramCache.getOrElseUpdate(spark, dir) {
      import graft.operators.NgramLm
      // train + score share the FAMILY-WIDE tokenize checkpoint (r15) —
      // the LM build no longer re-tokenizes a corpus another text query
      // already tokenized this session
      val toks = tokenized(spark, dir)
      val lm = NgramLm.train(toks.where(pmod(col("doc_id"), lit(2)) === 0))
      NgramLm.score(toks.where(pmod(col("doc_id"), lit(2)) === 1), lm)
        .localCheckpoint(true)
    }

  /** The shared line table for the [[graft.operators.LineDedup]]
    * queries. The synthetic corpus has no newlines, so "lines" are
    * derived deterministically (the PII-splice pattern): the token
    * stream chunked into 8-token lines, plus boilerplate lines spliced
    * in by doc_id modulus — a newsletter header on every third doc and
    * a legal footer on every fifth — which is exactly the repeated-
    * across-documents structure the boilerplate pass exists to remove.
    * The oracle mirrors the derivation verbatim; the CHECKED operators
    * are the df-count/anti-join and first-occurrence aggregations.
    */
  private def linesTable(spark: SparkSession, dir: String): DataFrame = {
    val header = "subscribe to our newsletter for updates"
    val footer = "all rights reserved legal notice footer"
    val noIdx = array().cast("array<int>")
    // tokens are computed ONCE per document in the projection BELOW the
    // generator: a chunk-slicing lambda that references the tokenize
    // expression directly would re-run the regex tokenizer PER CHUNK
    // (HOF lambdas evaluate interpreted — no codegen subexpression
    // elimination), which profiled at ~8x the whole query's cost.
    // Generate is an expression-inlining barrier, so exploding chunk
    // INDICES and slicing the carried token array above it keeps
    // tokenization linear in the corpus.
    val toks = tokenized(spark, dir)
    toks
      .select(col("doc_id"), col("ws"),
        posexplode(concat(
          when(pmod(col("doc_id"), lit(3)) === 0, array(lit(-2)))
            .otherwise(noIdx),
          // size=0 guard: sequence(0,-1) would infer step -1, not empty
          when(size(col("ws")) === 0, noIdx).otherwise(sequence(lit(0),
            ceil(size(col("ws")) / lit(8.0)).cast("int") - 1)),
          when(pmod(col("doc_id"), lit(5)) === 0, array(lit(-1)))
            .otherwise(noIdx))).as(Seq("line_no", "chunk")))
      .select(col("doc_id"), col("line_no"),
        when(col("chunk") === -2, lit(header))
          .when(col("chunk") === -1, lit(footer))
          .otherwise(array_join(
            slice(col("ws"), col("chunk") * 8 + 1, lit(8)), " "))
          .as("line"))
  }

  /** Boilerplate removal ([[graft.operators.LineDedup.dropFrequent]]):
    * lines shared by more than 20 documents are dropped everywhere,
    * survivors reassembled into per-doc text in original line order.
    */
  def boilerplateDrop(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LineDedup
    // the line table feeds BOTH sides of dropFrequent's anti-join;
    // checkpoint it once instead of re-tokenizing the corpus twice
    // (the BM25 localCheckpoint pattern)
    LineDedup.reassemble(LineDedup.dropFrequent(
        linesTable(spark, dir).localCheckpoint(), 20))
      .orderBy("doc_id")
  }

  /** Exact corpus-level line dedup
    * ([[graft.operators.LineDedup.keepFirst]]): each distinct line
    * survives only at its first (doc_id, line_no) occurrence.
    */
  def lineDedupFirst(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LineDedup
    LineDedup.keepFirst(linesTable(spark, dir))
      .orderBy("doc_id", "line_no")
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020 §4.3, public):
    * held-out documents cut into EXACT tertiles by trigram-LM score —
    * tile 1 = highest perplexity (least natural), tile 3 = head. The
    * ranking runs through [[graft.operators.QuantileBin.exactNtile]]
    * (value-bucketed distributed rank), so there is no corpus-wide
    * single-reducer sort at any scale.
    */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    graft.operators.QuantileBin.exactNtile(
        trigramScored(spark, dir),
        k = 3, valueCol = "avg_logprob",
        bucketWidth = 0.25, tieCols = Seq("doc_id"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_docs"),
        min("avg_logprob").as("min_lp"),
        max("avg_logprob").as("max_lp"),
        sum("n_tri").as("n_tri_total"))
      .orderBy("tile")

  /** Character-level Shannon entropy per document — the cheap
    * gibberish / encoding-noise signal (natural prose sits ~3.5-4.5
    * bits/char; base64 blobs and repeated-char junk fall far outside).
    * Computed ROW-LOCALLY with array HOFs (distinct chars -> counts ->
    * -sum p log2 p), so the 100 TB plan is scan-speed with ZERO
    * exchange — never the naive explode-per-character shuffle, whose
    * volume is the corpus itself. 6dp rounding absorbs the
    * engine-order summation difference vs the oracle's group-by form.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cs = split(col("text"), "")
    val n = size(cs).cast("double")
    val counts = transform(array_distinct(cs),
      c => size(filter(cs, x => x === c)).cast("double"))
    val ent = aggregate(counts, lit(0.0),
      (acc, cnt) => acc - (cnt / n) * log2(cnt / n))
    Tables(spark, dir, "documents").select(
        col("doc_id"),
        round(ent, 6).as("char_entropy"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** PII redaction over the corpus. The synthetic tables are PII-free
    * word soup, so deterministic PII (email / IPv4 / phone, presence
    * varying by doc_id modulus) is spliced in by a derivation the
    * oracle mirrors verbatim — the CHECKED operator is the ordered
    * regexp_replace redaction chain and the per-rule hit counts
    * ([[graft.text.Redact]]), all codegen'd built-ins at scan speed.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Redact
    val id = col("doc_id")
    val aug = concat(
      col("text"),
      when(pmod(id, lit(3)) =!= 0,
        concat(lit(" contact user"), id, lit("@mail.example.com")))
        .otherwise(lit("")),
      when(pmod(id, lit(4)) =!= 0,
        concat(lit(" from "), pmod(id, lit(256)), lit(".0.113."),
          pmod(id, lit(100))))
        .otherwise(lit("")),
      when(pmod(id, lit(5)) =!= 0,
        concat(lit(" call 555-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod(id, lit(7)) === 0, lit(" cc admin@example.org"))
        .otherwise(lit("")))
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      Redact.hits(aug, Redact.piiRules(0)).as("n_email"),
      Redact.hits(aug, Redact.piiRules(1)).as("n_ip"),
      Redact.hits(aug, Redact.piiRules(2)).as("n_phone"),
      Redact.redact(aug).as("redacted"))
      .orderBy("doc_id")
  }

  /** Linear quality-classifier inference (the fastText-style filter
    * stage of a training pipeline): engineered per-doc features ->
    * literal weight vector -> logit, entirely as codegen'd column
    * arithmetic — model inference without a UDF, at scan speed. The
    * logit stays LINEAR (no sigmoid) so every op is IEEE-exact and the
    * DuckDB oracle matches bit-for-bit; thresholding at 0 gives the
    * keep flag, monotone in the sigmoid anyway.
    */
  /** The fixed-weight linear quality logit shared by `qualityScore`,
    * `domainTopK` and DedupQueries' quality-aware survivor selection —
    * IEEE-exact in both engines (same op order).
    */
  private[queries] def qualityLogit: (Column, Column) = {
    val toks = split(col("text"), " ")
    val n = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    val ns = size(filter(toks, t => t.isin(stop.map(s => s: Any): _*)))
      .cast("double")
    val meanLen = (length(col("text")).cast("double") - (n - lit(1.0))) / n
    (n, lit(-1.5) + lit(0.01) * n + lit(2.0) * (nd / n) -
      lit(0.5) * meanLen + lit(1.2) * (ns / n))
  }

  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val (n, logit) = qualityLogit
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      logit.as("quality_logit"),
      (logit > lit(0.0)).as("keep"))
      .orderBy("doc_id")
  }

  /** Per-domain quality curation: the top 5 documents per source by
    * quality logit, ranked through the NATIVE bounded-heap
    * top-k-per-key operator (org.apache.spark.sql.graftx.TopKPerKey) —
    * the custom plan node doing [EXT] work: at most k rows per
    * (source, input partition) reach the shuffle, where a window
    * formulation would sort every document. Ordering is cross-engine
    * stable because the logit is IEEE-exact in both engines and ties
    * break on doc_id.
    */
  def domainTopK(spark: SparkSession, dir: String): DataFrame = {
    val (_, logit) = qualityLogit
    val scored = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), logit.as("quality_logit"))
    org.apache.spark.sql.graftx.TopKPerKey.topK(scored,
        keys = Seq("source"),
        order = Seq(("quality_logit", true), ("doc_id", false)), k = 5)
      .orderBy("source", "rank")
  }

  /** URL parsing over a deterministically synthesized url column (the
    * documents table carries no URLs): `parse_url` component extraction
    * — host / path / query / single query-param / protocol — the
    * domain-attribution primitives a web-corpus pipeline groups and
    * filters by. All codegen'd expressions, one scan, no shuffle; the
    * oracle states each component in closed form from the same fields.
    */
  def urlFuncs(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/doc/"), col("doc_id"),
      lit("?ref="), pmod(col("doc_id"), lit(7)),
      lit("&p="), pmod(col("doc_id"), lit(3)))
    Tables(spark, dir, "documents")
      .withColumn("url", url)
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"),
        parse_url(col("url"), lit("PROTOCOL")).as("scheme"))
      .orderBy("doc_id")
  }

  /** BM25 ranking of the corpus against a fixed query-term set — the
    * classic retrieval scorer, fully relational: tokens are filtered to
    * the query vocabulary BEFORE explode (the exchange carries only
    * query-term hits, ~|q|/|V| of the corpus token mass), term tf and
    * document length come from one (doc, term) hash agg, df from an agg
    * over THAT (already-tiny) table, and corpus scalars (N, avgdl) ride
    * a broadcast cross join. At 100 TB nothing scales with |V|: the
    * shuffled rows are bounded by docs x query terms. The float chain
    * mirrors the oracle op-for-op; only the final per-doc sum is
    * rounded (reassociation noise), rank cut on the ROUNDED score.
    */
  /** The BM25 query-term vocabulary shared by the ad-hoc/top-k, RRF
    * and retrieval-eval queries (union of the fixed query set and the
    * IR eval queries).
    */
  private lazy val bm25Vocab: Seq[String] =
    (Seq("hash", "vector", "filter", "merge", "scan") ++
      irQueries.flatMap(_._2)).distinct

  /** One (doc_id, dl, term, tf) HIT table + (n_docs, avgdl) stats pair
    * per (session, dir), over the UNION query vocabulary — the shared
    * materialization the whole BM25 family reads (round-6: previously
    * bm25TopK, hybridRrf and retrievalEval each re-tokenized the
    * corpus twice; now the two corpus scans happen once per dataset).
    * Per-query term subsets filter the checkpoint, which yields
    * row-identical tf/dft/stats values to the per-query builds, so
    * oracle parity is untouched. At 100 TB the table is bounded by
    * docs x union-vocabulary hits — the same scale class as any single
    * query's table.
    */
  private val bm25BaseCache =
    new graft.SessionMemo[(DataFrame, DataFrame)](8)(v => {
      graft.SessionMemo.free(v._1); graft.SessionMemo.free(v._2)
    })
  private def bm25Base(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    bm25BaseCache.getOrElseUpdate(spark, dir) {
      // the base reads the family-wide tokenize checkpoint (r15):
      // one tokenize pass per session serves BM25 too
      val toks = tokenized(spark, dir)
        .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
          filter(col("ws"), t => t.isInCollection(bm25Vocab)).as("qts"))
      val tf = toks
        .select(col("doc_id"), col("dl"), explode(col("qts")).as("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(count(lit(1)).cast("double").as("tf"))
        .localCheckpoint(true)
      val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
        avg("dl").as("avgdl")).localCheckpoint(true)
      (tf, stats)
    }

  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "vector", "filter", "merge", "scan")
    val (tfAll, stats) = bm25Base(spark, dir)
    val tf = tfAll.where(col("term").isInCollection(qTerms))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dft"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("dft") + lit(0.5)) /
          (col("dft") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** The persisted-index probe for the same query terms — build-once
    * (keyed by the immutable dataset dir), then every probe is posting-
    * list-sized work. Registered against the SAME oracle as the ad-hoc
    * path: the index lifecycle must be result-invisible.
    */
  def bm25IndexTopK(spark: SparkSession, dir: String): DataFrame = {
    // cache key = the FULL sanitized dataset path (an Int hashCode can
    // collide across dirs); the rebuild guard is an explicit completion
    // marker written AFTER all three index dirs land, so a crash
    // between the postings write and the dfs/stats writes leaves a
    // half-index that is rebuilt, never served (r3 advisor)
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_idx_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new java.io.File(s"$idx/_GRAFT_INDEX_COMPLETE")
    if (!marker.exists()) {
      graft.operators.Bm25Index.write(
        Tables(spark, dir, "documents"), "doc_id", "text", idx)
      marker.createNewFile()
    }
    graft.operators.Bm25Index.query(spark, idx,
      Seq("hash", "vector", "filter", "merge", "scan"), k = 20)
  }

  /** Hybrid retrieval by reciprocal-rank fusion (public method:
    * Cormack et al. 2009): two retrievers rank the corpus for the same
    * query — BM25 and a plain tf-idf dot score — and fuse as
    * sum(1 / (60 + rank)). Both retrievers share ONE (doc, term, tf)
    * materialization (the corpus is tokenized once); each ranking is
    * cut to its top 50 with TakeOrdered BEFORE the row_number pass, so
    * the only unpartitioned window runs over 50 rows by construction.
    * Ranks are integers, so fusion has no cross-engine float-ordering
    * hazard; scores are rounded exactly like the bm25 oracle before
    * ranking so tie order is pinned on both engines.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "vector", "filter", "merge", "scan")
    val (tfAll, stats) = bm25Base(spark, dir)
    val tf = tfAll.where(col("term").isInCollection(qTerms))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dft"))
    val scored = tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
    val bm25 = scored
      .withColumn("contrib",
        log((col("n_docs") - col("dft") + lit(0.5)) /
          (col("dft") + lit(0.5)) + lit(1.0)) * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("contrib"), 6).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(50)
    val tfidf = scored
      .withColumn("contrib",
        col("tf") * log(col("n_docs") / col("dft")))
      .groupBy("doc_id").agg(round(sum("contrib"), 6).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(50)
    // The candidate lists are ≤50 rows BY CONSTRUCTION (TakeOrdered
    // with limit), so rank them on the driver (the BoundedPrefix
    // recipe) instead of paying a single-reducer global-window stage;
    // each collect rides the checkpointed term-frequency table.
    def ranked(df: DataFrame, rank: String) = {
      import spark.implicits._
      df.select(col("doc_id"), col("s")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex
        .map { case ((id, _), i) => (id, (i + 1).toLong) }
        .toSeq.toDF("doc_id", rank)
    }
    ranked(bm25, "rank_bm25")
      .join(ranked(tfidf, "rank_tfidf"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(60) + col("rank_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_tfidf")), lit(0.0)),
          6).as("rrf"),
        coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
        coalesce(col("rank_tfidf"), lit(0L)).as("rank_tfidf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Bigram collocations by pointwise mutual information: adjacent
    * token pairs vs their unigram marginals, min count 5 — the
    * phrase-mining readout (which token pairs co-occur far above
    * chance). Two hash aggs off one checkpointed tokenize pass, two
    * scalar totals, marginal joins with no broadcast hint (a web-scale
    * vocabulary is not small; AQE broadcasts when it actually is).
    * ln rounded at 4 like the logprob oracle (cross-engine parity
    * demonstrated there).
    */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    // bigram + unigram aggs + the scalar normalizers all read the
    // family-wide tokenize checkpoint (r15 — was a private
    // (ws)-only checkpoint, one more tokenize pass per session)
    val toks = tokenized(spark, dir)
    val bg = toks
      .select(explode(when(size(col("ws")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2"))))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // the two normalizers are row-local sums over the token-array
    // lengths (total tokens; total bigrams = sum of max(len-1, 0)) —
    // ONE scan of the checkpointed tokens, no explode, no shuffle,
    // instead of re-running the unigram and bigram aggregations just
    // to fold them back down to scalars (same discipline as
    // text_unigram_logprob's corpus total)
    val totals = toks.agg(
      sum(size(col("ws"))).as("nt"),
      sum(greatest(size(col("ws")) - 1, lit(0))).as("nb")).collect()(0)
    val nTok = totals.getLong(0).toDouble
    val nBg = totals.getLong(1).toDouble
    bg.where(col("c_ab") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log((col("c_ab") / lit(nBg)) /
          ((col("c1") / lit(nTok)) * (col("c2") / lit(nTok)))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Feature hashing (HashingTF-style): tokens bucketed by a content
    * hash into a fixed 16-dim count vector, long form (doc, bucket, n)
    * — the input layout for a linear quality classifier at corpus
    * scale (no vocabulary broadcast, dimensionality fixed up front).
    * md5-derived buckets so the oracle replays the hash exactly; a
    * production run swaps xxhash64 (same shape, no string digest).
    */
  def hashedFeatures(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("w")), 1, 7), 16, 10).cast("long"),
          lit(16L)))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "bucket")

  /** One unigram-LM vocabulary per dataset dir, trained once per JVM
    * and shared by the vocab/encode queries (the BPE pair does the
    * same via its own train call; here the trained artifact is a
    * driver-sized Seq, so a memo is the natural cache). Deterministic:
    * [[graft.operators.UnigramLm.train]] is partition-layout
    * independent, so the memo changes cost, never content.
    */
  private val ulmCache =
    new graft.SessionMemo[(Seq[(String, Long, Double)], DataFrame)](8)(
      v => graft.SessionMemo.free(v._2))
  private def ulmVocabFor(spark: SparkSession, dir: String)
      : (Seq[(String, Long, Double)], DataFrame) =
    // keyed per (session, dir): the cached word-type DataFrame is
    // session-bound (localCheckpoint blocks die with their session)
    ulmCache.getOrElseUpdate(spark, dir) {
      graft.operators.UnigramLm.train(Tables(spark, dir, "documents"),
        "text", targetVocab = 512, maxPieceLen = 5, emIters = 2,
        maxCandidates = 2048)
    }

  /** Unigram-LM (SentencePiece-family) trained vocabulary: top pieces
    * by corpus-weighted Viterbi use count. Rows-only for the driver
    * (EM floats aren't cross-engine SQL); golden-hash pinned.
    */
  def ulmVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ulmVocabFor(spark, dir)._1.toDF("piece", "n_uses", "logprob")
      .select(col("piece"), col("n_uses"),
        round(col("logprob"), 6).as("logprob"))
      .orderBy(col("n_uses").desc, col("piece")).limit(200)
  }

  /** Tokenizer application under the trained unigram-LM vocab:
    * per-document word/subword counts + fertility. Encodes word TYPES
    * (distinct words segment once, events join the type table) — the
    * same never-refold-the-corpus shape as the BPE profile.
    */
  def ulmEncode(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, words) = ulmVocabFor(spark, dir)
    val lp = vocab.map(v => (v._1, v._3)).toMap
    val seg = graft.operators.UnigramLm.segment(lp, maxPieceLen = 5)
    val types = words
      .select(col("word"), size(seg(col("word"))).cast("long").as("_ns"))
    tokenized(spark, dir)
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .join(types, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("_ns").as("n_subwords"),
        round(avg("_ns"), 4).as("fertility"))
      .orderBy("doc_id")
  }

  /** Per-document trigram novelty in corpus (doc_id) order — diversity
    * accounting: how many of a document's trigram TYPES appear here
    * first vs were already contributed by an earlier document. The
    * standard "is the tail of this corpus still adding content"
    * curation readout (a falling novelty curve says later sources are
    * re-treading earlier ones).
    *
    * Scale shape: ONE tokenize pass builds the distinct (doc, gram)
    * type table (checkpointed — both aggregations consume it); the
    * first-occurrence election is a map-side-combining min agg per
    * gram, and — the round-6 rewrite — n_novel per doc falls straight
    * out of COUNTING the election winners by doc, so the old
    * gram-keyed join of the election back against the full type table
    * (the widest shuffle in the plan) is gone entirely: what remains
    * is two hash aggs off the checkpoint and a doc-keyed join of two
    * per-doc aggregate tables (corpus-cardinality rows, not
    * gram-instance rows). Same-window A/B at sf0.1: 6.1 s -> 3.7-4.9 s
    * (absolute numbers ride the host's 2-3x drift band; the removed
    * gram-keyed join is the structural point).
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // per-doc distinct is ROW-LOCAL (round 10): array_distinct before
    // the explode replaces the old corpus-wide .distinct() — a full
    // shuffle dedup of every trigram instance — with in-row work; the
    // (doc, gram) pairs are unique by construction since a doc's grams
    // dedup inside their own array
    val types = tokenized(spark, dir)
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))).as("g"))
      .localCheckpoint(true)
    val novel = types.groupBy("g").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    types.groupBy("doc_id").agg(count(lit(1)).as("n_gram_types"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_gram_types"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_gram_types"), 4).as("novelty"))
      .orderBy("doc_id")
  }

  /** Zipf's-law fit over the corpus word-frequency distribution: OLS
    * slope/intercept of ln(cnt) on ln(rank) for the top-200 word
    * types — the corpus-health readout (natural text slopes ~-1;
    * template/boilerplate-heavy corpora flatten, spam steepens).
    * Scale shape: one hash agg to the Zipf-bounded (word, cnt) table,
    * a 200-row TakeOrdered, and driver arithmetic over those 200
    * scalars in EXPLICIT rank order — the oracle replays the identical
    * sequential sums (DuckDB `list_sum(list(... ORDER BY rank))`), so
    * the fit is bit-deterministic, not approximately equal.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = tokenized(spark, dir)
      .select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(200)
      .collect() // TakeOrdered: rows arrive in rank order
    val n = ranked.length.toDouble
    val xs = ranked.indices.map(i => math.log((i + 1).toDouble))
    val ys = ranked.map(r => math.log(r.getLong(1).toDouble))
    // sequential left folds in rank order — the oracle's list_sum order
    val sx = xs.foldLeft(0.0)(_ + _)
    val sy = ys.foldLeft(0.0)(_ + _)
    val sxy = xs.zip(ys).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
    val sxx = xs.foldLeft(0.0)((a, x) => a + x * x)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((ranked.length.toLong, r6(slope), r6(intercept)))
      .toDF("n_words", "slope", "intercept")
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * degree/freq over phrase instances (degree = summed length of the
    * phrases it appears in), and a phrase scores the sum of its words'
    * scores — the classic no-model keyphrase ranker, top 30 phrase
    * types.
    *
    * Scale shape: the phrase segmentation is a PER-DOCUMENT window
    * (running stopword count partitioned by doc_id — never global),
    * word stats are one hash agg over phrase-word instances, and the
    * phrase score joins word stats back on the word key with no
    * broadcast hint. Top-30 executes as TakeOrdered.
    */
  def rakeTopK(spark: SparkSession, dir: String): DataFrame =
    rakeTopKFrom(Tables(spark, dir, "documents"))

  /** One compiled pass per document emitting the stopword-free phrase
    * runs directly — [[TextOps.tokens]]' exact tokenization (lowercase,
    * non-letters break words) with stopwords closing the current
    * phrase. UDF for the same reason as CorpusPipeline.tokenStatsUdf:
    * the declarative HOF form rescans the stopword array per token.
    */
  private lazy val rakePhrasesUdf = {
    val stopSet = stop.toSet
    udf { text: String =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new java.lang.StringBuilder
      val phrase = new java.lang.StringBuilder
      var plen = 0
      def flushPhrase(): Unit = if (plen > 0) {
        out += phrase.toString; phrase.setLength(0); plen = 0
      }
      def flushWord(): Unit = if (sb.length > 0) {
        val w = sb.toString
        sb.setLength(0)
        if (stopSet.contains(w)) flushPhrase()
        else {
          if (plen > 0) phrase.append(' ')
          phrase.append(w); plen += 1
        }
      }
      if (text != null) {
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          if (c >= 'a' && c <= 'z') sb.append(c)
          else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
          else flushWord() // non-letters end the WORD, not the phrase
          i += 1
        }
        flushWord(); flushPhrase()
      }
      out.toSeq
    }
  }

  /** [[rakeTopK]] over an explicit documents frame — the scale-
    * rehearsal seam (ScaleRehearsalSpec runs it on a 10x corpus).
    *
    * Round 10 rewrite: the old form posexploded EVERY token through a
    * per-document running-stopword-count window (a full-corpus
    * shuffle + sort) and then rebuilt phrase adjacency with two
    * (doc_id, grp) joins — structure the row already carried. The
    * row-local [[rakePhrasesUdf]] emits phrase instances in one scan;
    * what remains distributed is exactly the part that needs to be:
    * the word-stats hash agg, the word-key join, and the phrase
    * scoring agg ending in TakeOrdered. Same output (oracle
    * unchanged, green at sf0.001/0.01/0.1). Local bench moves only
    * ~10% (1.79 -> 1.61 s at sf0.1 — job overhead dominates at 5000
    * docs), but the structural point is the 100 TB one: the full
    * token-instance shuffle + per-doc sort the window required is
    * gone; every remaining exchange carries phrase/word aggregates.
    */
  private[graft] def rakeTopKFrom(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(rakePhrasesUdf(col("text"))).as("phrase"))
      .select(col("phrase"),
        size(split(col("phrase"), " ")).cast("long").as("plen"),
        explode(split(col("phrase"), " ")).as("w"))
      .localCheckpoint(true) // word stats + phrase scoring share it
    val wordStats = words
      .groupBy("w").agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
    words
      .join(wordStats, "w")
      .groupBy("phrase")
      .agg((count(lit(1)) / max("plen")).cast("long").as("n_occurrences"),
        round(sum(col("degree").cast("double") / col("freq")) /
          (count(lit(1)) / max("plen")), 4).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(30)
  }

  /** TextTiling-style topic-shift segmentation (Hearst 1997,
    * vocabulary-introduction variant): at every 5-token gap, the
    * fraction of the right 10-token block's vocabulary NOT present in
    * the left block; a gap scoring >= 0.6 is a candidate topic
    * boundary — the long-document chunking signal that splits on
    * topic shifts instead of fixed strides.
    *
    * Everything is a row-local array HOF fold (transform over gap
    * positions, slice/distinct/except per gap, sequential aggregate
    * for the mean — identical fold order in both engines): ZERO
    * exchanges at any corpus size, the same plan class as
    * text_char_entropy.
    */
  def segmentation(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .withColumn("fr", expr(
        """CASE WHEN size(ws) >= 20 THEN
             transform(sequence(10, size(ws) - 10, 5), p ->
               size(array_except(array_distinct(slice(ws, p + 1, 10)),
                                 array_distinct(slice(ws, p - 9, 10)))) /
               cast(size(array_distinct(slice(ws, p + 1, 10))) as double))
           ELSE array() END"""))
      .select(
        col("doc_id"),
        size(col("fr")).cast("long").as("n_gaps"),
        expr("size(filter(fr, x -> x >= 0.6))").cast("long")
          .as("n_boundaries"),
        round(expr("aggregate(fr, cast(0.0 as double), (a, x) -> a + x)") /
          greatest(size(col("fr")), lit(1)), 4).as("avg_new_frac"))
      .orderBy("doc_id")

  /** Flesch-Kincaid-style readability grade — the classic prose
    * complexity signal quality filters blend in. Syllables are the
    * standard vowel-group heuristic (runs of [aeiouy], min 1/word);
    * the corpus has no sentence punctuation, so sentences are the
    * fixed-width pseudo-sentence convention (ceil(words/15)). Pure
    * row-local fold — zero exchanges; both engines run the identical
    * sequential arithmetic so the grade is bit-stable.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .where(size(col("ws")) > 0)
      .withColumn("_syl", expr(
        "aggregate(transform(ws, w -> greatest(" +
          "size(regexp_extract_all(w, '[aeiouy]+', 0)), 1)), 0, " +
          "(a, x) -> a + x)"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        col("_syl").cast("long").as("n_syllables"),
        ceil(size(col("ws")) / lit(15.0)).cast("long").as("n_sentences"),
        // raw IEEE double, no round: every input is an exact integer,
        // so the arithmetic is bit-identical in both engines (the
        // float-parity rule — round() on row-level arithmetic is the
        // boundary-flip hazard, not the fix)
        (lit(0.39) * (size(col("ws")).cast("double") /
          ceil(size(col("ws")) / lit(15.0)).cast("double")) +
          lit(11.8) * (col("_syl").cast("double") /
            size(col("ws")).cast("double")) - lit(15.59))
          .as("fk_grade"))
      .orderBy("doc_id")

  /** The retrieval-eval query set: three multi-term queries over the
    * corpus vocabulary. Shared by the Spark query and its oracle text.
    */
  private val irQueries: Seq[(Long, Seq[String])] = Seq(
    (1L, Seq("hash", "vector", "filter")),
    (2L, Seq("merge", "scan", "sort", "join")),
    (3L, Seq("stream", "window", "data")))

  /** Retrieval-quality evaluation — nDCG@10, MRR@10 and precision@10
    * of the BM25 ranking against deterministic graded relevance
    * (grade = number of query terms occurring at least TWICE in the
    * document — a breadth-of-coverage criterion deliberately distinct
    * from BM25's tf/length preferences, so rank and relevance order
    * genuinely disagree; relevant = grade >= 2, gain = 2^grade - 1).
    * The search-quality readout an embedding/BM25 retrieval stack is
    * monitored by.
    *
    * Scale shape: ONE tokenize pass for all queries (term filter on
    * the union vocabulary), scoring joins over (doc, term) HIT rows
    * only, rankings via per-query top-k windows (the native
    * TopKPerKey rewrite fires — k rows per query per partition reach
    * the shuffle). Scores round to 6dp BEFORE ranking with doc_id
    * tie-break — the cross-engine rank-determinism contract the BM25
    * oracle already uses. Fully oracle-checked, iteration-free.
    */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val qterms = irQueries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val allTerms = irQueries.flatMap(_._2).distinct
    val (tfAll, stats) = bm25Base(spark, dir)
    val tf = tfAll.where(col("term").isInCollection(allTerms))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dft"))
    val scored = tf.join(broadcast(dft), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("dft") + lit(0.5)) /
          (col("dft") + lit(0.5)) + lit(1.0)) * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib"), 6).as("score"),
        sum(when(col("tf") >= 2, 1L).otherwise(0L)).as("grade"))
      .localCheckpoint(true) // ranking + ideal ranking share it
    val gain = pow(lit(2.0), col("grade")) - lit(1.0)
    val ranked = scored
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id"))))
      .where(col("rnk") <= 10)
    val ideal = scored
      .withColumn("irank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("grade").desc, col("doc_id"))))
      .where(col("irank") <= 10)
      .groupBy("query_id")
      .agg(sum(gain / log2(col("irank") + 1)).as("idcg"))
    ranked.groupBy("query_id")
      .agg(sum(gain / log2(col("rnk") + 1)).as("dcg"),
        sum(when(col("grade") >= 2, 1.0).otherwise(0.0)).as("n_rel"),
        min(when(col("grade") >= 2, col("rnk"))).as("first_rel"))
      .join(ideal, "query_id")
      .select(col("query_id"),
        round(col("dcg") / col("idcg"), 6).as("ndcg10"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)
          .as("mrr10"),
        round(col("n_rel") / 10.0, 6).as("p10"))
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_retrieval_eval" -> retrievalEval,
    "text_readability" -> readability,
    "text_segmentation" -> segmentation,
    "text_rake_topk" -> rakeTopK,
    "text_ngram_novelty" -> ngramNovelty,
    "text_zipf_fit" -> zipfFit,
    "text_ulm_vocab" -> ulmVocab,
    "text_ulm_encode" -> ulmEncode,
    "text_hashed_features" -> hashedFeatures,
    "text_hybrid_rrf" -> hybridRrf,
    "text_pmi_bigrams" -> pmiBigrams,
    "text_bm25_index_topk" -> bm25IndexTopK,
    "text_bm25_topk" -> bm25TopK,
    "text_url_funcs" -> urlFuncs,
    "text_boilerplate_drop" -> boilerplateDrop,
    "text_line_dedup_first" -> lineDedupFirst,
    "text_pii_redact" -> piiRedact,
    "text_quality_score" -> qualityScore,
    "text_char_entropy" -> charEntropy,
    "text_domain_topk" -> domainTopK,
    "text_unigram_logprob" -> unigramLogprob,
    "text_trigram_logprob" -> trigramLogprob,
    "text_perplexity_buckets" -> perplexityBuckets,
    "text_gopher_quality" -> gopherQuality,
    "text_keyword_topk" -> keywordTopK,
    "text_inverted_index" -> invertedIndex,
    "text_quality_stats" -> qualityStats,
    "text_quality_blend" -> qualityBlend,
    "text_lang_stats" -> langStats,
    "text_token_counts" -> tokenCounts)

  private val tokSql =
    raw"string_split_regex(lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), '\s+')"

  /** Oracle-side mirror of [[qualityLogit]]: a CTE body computing
    * `q(doc_id, quality_logit)` over documents — shared with the
    * DedupQueries quality-survivor oracle so both engines score with
    * the exact same expression text.
    */
  private[queries] lazy val qualityLogitCteSql =
    raw"""SELECT doc_id,
    -1.5 + 0.01 * n + 2.0 * (nd / n) -
      0.5 * ((nc - (n - 1.0)) / n) + 1.2 * (ns / n) AS quality_logit
  FROM (
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      CAST(len(list_filter(string_split(text, ' '),
        w -> w IN $stopSql)) AS DOUBLE) AS ns,
      CAST(len(text) AS DOUBLE) AS nc
    FROM documents)"""

  private val emailRe = raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
  private val ipRe = raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
  private val phoneRe = raw"\b\d{3}-\d{4}\b"

  /** The trigram stupid-backoff scoring chain as a CTE prefix ending in
    * `docscore(doc_id, n_tri, avg_logprob)` — shared by the trigram
    * query and the perplexity-bucket readout built on top of it.
    */
  private val trigramScoreCte =
    raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), tri AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
  FROM tok, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
), c3t AS (
  SELECT w1, w2, w3, count(*) AS c3 FROM tri WHERE doc_id % 2 = 0
  GROUP BY 1, 2, 3
), big AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM tok, unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
), c2t AS (
  SELECT w1, w2, count(*) AS c2 FROM big WHERE doc_id % 2 = 0 GROUP BY 1, 2
), uni AS (
  SELECT unnest(ws) AS w FROM tok WHERE doc_id % 2 = 0
), c1t AS (SELECT w, count(*) AS c1 FROM uni GROUP BY 1),
nv AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(count(DISTINCT w) AS DOUBLE) AS v
  FROM uni
), doctri AS (
  SELECT doc_id, w1, w2, w3, count(*) AS m FROM tri WHERE doc_id % 2 = 1
  GROUP BY 1, 2, 3, 4
), types AS (SELECT DISTINCT w1, w2, w3 FROM doctri),
scored AS (
  SELECT t.w1, t.w2, t.w3,
    ln(CASE
      WHEN c3t.c3 IS NOT NULL THEN CAST(c3t.c3 AS DOUBLE) / p12.c2
      WHEN s23.c2 IS NOT NULL THEN 0.4 * CAST(s23.c2 AS DOUBLE) / u2.c1
      ELSE 0.4 * 0.4 * (COALESCE(u3.c1, 0) + 1)
        / ((SELECT n FROM nv) + (SELECT v FROM nv))
    END) AS lp
  FROM types t
  LEFT JOIN c3t ON t.w1 = c3t.w1 AND t.w2 = c3t.w2 AND t.w3 = c3t.w3
  LEFT JOIN c2t p12 ON t.w1 = p12.w1 AND t.w2 = p12.w2
  LEFT JOIN c2t s23 ON t.w2 = s23.w1 AND t.w3 = s23.w2
  LEFT JOIN c1t u2 ON t.w2 = u2.w
  LEFT JOIN c1t u3 ON t.w3 = u3.w
), docscore AS (
  SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_tri,
    round(sum(d.m * s.lp) / sum(d.m), 4) AS avg_logprob
  FROM doctri d JOIN scored s
    ON d.w1 = s.w1 AND d.w2 = s.w2 AND d.w3 = s.w3
  GROUP BY d.doc_id
)"""

  /** DuckDB replay of [[retrievalEval]] — same query VALUES, same
    * rounded-score-then-doc_id rank order, same gain/ideal-DCG
    * arithmetic, so rank determinism is value-checked cross-engine.
    */
  private lazy val irOracleSql: String = {
    val vals = irQueries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")
    val inList = irQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(",")
    raw"""WITH toks AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), base AS (
  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
    list_filter(ws, w -> w IN ($inList)) AS qts
  FROM toks
), tfa AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, dl, unnest(qts) AS term FROM base)
  GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tfa GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
), qterms(query_id, term) AS (VALUES $vals),
scored AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, tfa.doc_id,
    round(sum(ln((n_docs - dft + 0.5) / (dft + 0.5) + 1.0) * tf * 2.2 /
      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score,
    CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS grade
  FROM tfa, dft, stats, qterms
  WHERE tfa.term = dft.term AND tfa.term = qterms.term
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, grade, row_number() OVER
    (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM scored
), ideal AS (
  SELECT query_id,
    sum((power(2, grade) - 1) / log2(irank + 1)) AS idcg
  FROM (SELECT query_id, grade, row_number() OVER
    (PARTITION BY query_id ORDER BY grade DESC, doc_id) AS irank
    FROM scored)
  WHERE irank <= 10 GROUP BY query_id
), m AS (
  SELECT query_id,
    sum((power(2, grade) - 1) / log2(rnk + 1)) AS dcg,
    sum(CASE WHEN grade >= 2 THEN 1.0 ELSE 0.0 END) AS n_rel,
    min(CASE WHEN grade >= 2 THEN rnk END) AS first_rel
  FROM ranked WHERE rnk <= 10 GROUP BY query_id
)
SELECT m.query_id AS query_id, round(dcg / idcg, 6) AS ndcg10,
  round(coalesce(1.0 / first_rel, 0.0), 6) AS mrr10,
  round(n_rel / 10.0, 6) AS p10
FROM m JOIN ideal ON m.query_id = ideal.query_id
ORDER BY m.query_id"""
  }

  private val bm25OracleSql =
      raw"""WITH toks AS (
  SELECT doc_id,
    list_filter($tokSql, w -> w <> '') AS ws
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
    list_filter(ws, w -> w IN ('hash','vector','filter','merge','scan'))
      AS qts
  FROM toks
), tf AS (
  SELECT doc_id, dl, unnest(qts) AS term FROM base
), tfa AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tf GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tfa GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
), scored AS (
  SELECT doc_id,
    ln((n_docs - dft + 0.5) / (dft + 0.5) + 1.0) * tf * 2.2 /
      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS contrib
  FROM tfa, dft, stats WHERE tfa.term = dft.term
)
SELECT doc_id, round(sum(contrib), 6) AS bm25,
  count(*) AS n_terms_hit
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20"""

  private val hybridOracleSql =
      raw"""WITH toks AS (
  SELECT doc_id,
    list_filter($tokSql, w -> w <> '') AS ws
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
    list_filter(ws, w -> w IN ('hash','vector','filter','merge','scan'))
      AS qts
  FROM toks
), tf AS (
  SELECT doc_id, dl, unnest(qts) AS term FROM base
), tfa AS (
  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tf GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tfa GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
), bm AS (
  SELECT doc_id, round(sum(
    ln((n_docs - dft + 0.5) / (dft + 0.5) + 1.0) * tf * 2.2 /
      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s
  FROM tfa, dft, stats WHERE tfa.term = dft.term
  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 50
), ti AS (
  SELECT doc_id, round(sum(tf * ln(n_docs / dft)), 6) AS s
  FROM tfa, dft, stats WHERE tfa.term = dft.term
  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 50
), ra AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY s DESC, doc_id) AS rank_bm25 FROM bm
), rb AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY s DESC, doc_id) AS rank_tfidf FROM ti
)
SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
  round(coalesce(1.0 / (60 + rank_bm25), 0) +
    coalesce(1.0 / (60 + rank_tfidf), 0), 6) AS rrf,
  coalesce(rank_bm25, 0) AS rank_bm25,
  coalesce(rank_tfidf, 0) AS rank_tfidf
FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
ORDER BY rrf DESC, doc_id LIMIT 20"""

  private val pmiOracleSql =
      raw"""WITH toks AS (
  SELECT list_filter($tokSql, w -> w <> '') AS ws FROM documents
), bg AS (
  SELECT ws[CAST(u.i AS BIGINT)] AS w1, ws[CAST(u.i + 1 AS BIGINT)] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(ws))) AS i) u
), bgc AS (
  SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2
), uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM toks)
  GROUP BY w
), nt AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
nb AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS n FROM bgc)
SELECT w1, w2, c_ab,
  round(ln((c_ab / nb.n) / ((u1.c / nt.n) * (u2.c / nt.n))), 4) AS pmi
FROM bgc
JOIN uni u1 ON u1.w = w1
JOIN uni u2 ON u2.w = w2, nt, nb
WHERE c_ab >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20"""

  val oracle: Map[String, String] = Map(
    // sequential list_sum folds in rank order replicate the Spark
    // driver's foldLeft op order exactly — bit-deterministic OLS
    "text_zipf_fit" ->
      raw"""WITH tok AS (
  SELECT unnest(list_filter($tokSql, w -> w <> '')) AS w FROM documents
), wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w
), r AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM wc
), top AS (SELECT cnt, rank FROM r WHERE rank <= 200),
l AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    list_sum(list(ln(CAST(rank AS DOUBLE)) ORDER BY rank)) AS sx,
    list_sum(list(ln(CAST(cnt AS DOUBLE)) ORDER BY rank)) AS sy,
    list_sum(list(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
      ORDER BY rank)) AS sxy,
    list_sum(list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
      ORDER BY rank)) AS sxx
  FROM top
)
SELECT CAST(n AS BIGINT) AS n_words,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS intercept
FROM l""",
    "text_readability" ->
      raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), syl AS (
  SELECT doc_id, ws,
    list_sum(list_transform(ws, w ->
      greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS s
  FROM tok WHERE len(ws) > 0
)
SELECT doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(s AS BIGINT) AS n_syllables,
  CAST(ceil(len(ws) / 15.0) AS BIGINT) AS n_sentences,
  0.39 * (CAST(len(ws) AS DOUBLE) /
      CAST(ceil(len(ws) / 15.0) AS DOUBLE)) +
    11.8 * (CAST(s AS DOUBLE) / CAST(len(ws) AS DOUBLE)) - 15.59
    AS fk_grade
FROM syl ORDER BY doc_id""",
    "text_segmentation" ->
      raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), fr AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 20 THEN
      list_transform(range(10, len(ws) - 10 + 1, 5), p ->
        len(list_filter(list_distinct(list_slice(ws, p + 1, p + 10)),
          x -> NOT list_contains(list_distinct(list_slice(ws, p - 9, p)),
            x))) /
        CAST(len(list_distinct(list_slice(ws, p + 1, p + 10))) AS DOUBLE))
    ELSE [] END AS f
  FROM tok
)
SELECT doc_id, CAST(len(f) AS BIGINT) AS n_gaps,
  CAST(len(list_filter(f, x -> x >= 0.6)) AS BIGINT) AS n_boundaries,
  round(COALESCE(list_sum(f), 0.0) / greatest(len(f), 1), 4)
    AS avg_new_frac
FROM fr ORDER BY doc_id""",
    "text_rake_topk" ->
      raw"""WITH tokl AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), tok AS (
  SELECT doc_id, i AS pos, ws[i] AS w
  FROM tokl, unnest(range(1, len(ws) + 1)) AS t(i)
), m AS (
  SELECT doc_id, pos, w, (w IN $stopSql) AS st FROM tok
), g AS (
  SELECT doc_id, pos, w, st,
    sum(CASE WHEN st THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM m
), pw AS (SELECT doc_id, grp, pos, w FROM g WHERE NOT st),
ph AS (
  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen,
    string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM pw GROUP BY 1, 2
), wstat AS (
  SELECT w, count(*) AS freq, sum(plen) AS degree
  FROM pw JOIN ph USING (doc_id, grp) GROUP BY 1
), inst AS (
  SELECT ph.phrase, ph.plen, pw.w FROM pw JOIN ph USING (doc_id, grp)
)
SELECT phrase,
  CAST(count(*) / max(plen) AS BIGINT) AS n_occurrences,
  round(sum(CAST(degree AS DOUBLE) / freq) / (count(*) / max(plen)), 4)
    AS score
FROM inst JOIN wstat USING (w)
GROUP BY phrase
ORDER BY score DESC, phrase LIMIT 30""",
    "text_ngram_novelty" ->
      raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), tri AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM tok, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
), types AS (SELECT DISTINCT doc_id, g FROM tri),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM types GROUP BY 1)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_gram_types,
  CAST(sum(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  round(CAST(sum(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
    AS DOUBLE) / count(*), 4) AS novelty
FROM types t JOIN firsts f USING (g)
GROUP BY 1 ORDER BY 1""",
    "text_hashed_features" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest(list_filter($tokSql, w -> w <> '')) AS w
  FROM documents
)
SELECT doc_id,
  CAST('0x' || substr(md5(w), 1, 7) AS BIGINT) % 16 AS bucket,
  count(*) AS n
FROM tok GROUP BY doc_id, bucket ORDER BY doc_id, bucket""",
    "text_hybrid_rrf" -> hybridOracleSql,
    "text_pmi_bigrams" -> pmiOracleSql,
    "text_bm25_topk" -> bm25OracleSql,
    "text_bm25_index_topk" -> bm25OracleSql,
    "text_retrieval_eval" -> irOracleSql,
    "text_url_funcs" ->
      """SELECT doc_id,
  source || '.example.com' AS host,
  '/' || lang || '/doc/' || doc_id AS path,
  'ref=' || (doc_id % 7) || '&p=' || (doc_id % 3) AS query,
  CAST(doc_id % 7 AS VARCHAR) AS ref_param,
  'https' AS scheme
FROM documents ORDER BY doc_id""",
    "text_pii_redact" ->
      raw"""WITH aug AS (
  SELECT doc_id, text ||
    (CASE WHEN doc_id % 3 <> 0 THEN ' contact user' ||
      CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END) ||
    (CASE WHEN doc_id % 4 <> 0 THEN ' from ' ||
      CAST(doc_id % 256 AS VARCHAR) || '.0.113.' ||
      CAST(doc_id % 100 AS VARCHAR) ELSE '' END) ||
    (CASE WHEN doc_id % 5 <> 0 THEN ' call 555-' ||
      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
    (CASE WHEN doc_id % 7 = 0 THEN ' cc admin@example.org' ELSE '' END)
    AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '$ipRe')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(t,
    '$emailRe', '<EMAIL>', 'g'),
    '$ipRe', '<IP>', 'g'),
    '$phoneRe', '<PHONE>', 'g') AS redacted
FROM aug ORDER BY doc_id""",
    "text_char_entropy" ->
      raw"""WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
), f AS (
  SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1, 2
), tot AS (
  SELECT doc_id, sum(n) AS t FROM f GROUP BY 1
)
SELECT f.doc_id, round(-sum((n / t) * log2(n / t)), 6) AS char_entropy,
  CAST(t AS BIGINT) AS n_chars
FROM f JOIN tot USING (doc_id) GROUP BY f.doc_id, t ORDER BY doc_id""",
    "text_domain_topk" ->
      raw"""WITH f AS (
  SELECT source, doc_id,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
    CAST(len(list_filter(string_split(text, ' '),
      w -> w IN $stopSql)) AS DOUBLE) AS ns,
    CAST(len(text) AS DOUBLE) AS nc
  FROM documents
), scored AS (
  SELECT source, doc_id,
    -1.5 + 0.01 * n + 2.0 * (nd / n) -
      0.5 * ((nc - (n - 1.0)) / n) + 1.2 * (ns / n) AS quality_logit
  FROM f
), ranked AS (
  SELECT source, doc_id, quality_logit,
    row_number() OVER (PARTITION BY source
      ORDER BY quality_logit DESC, doc_id) AS rank
  FROM scored
)
SELECT source, doc_id, quality_logit, rank FROM ranked
WHERE rank <= 5 ORDER BY source, rank""",
    "text_quality_score" ->
      raw"""WITH f AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
    CAST(len(list_filter(string_split(text, ' '),
      w -> w IN $stopSql)) AS DOUBLE) AS ns,
    CAST(len(text) AS DOUBLE) AS nc
  FROM documents
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
  -1.5 + 0.01 * n + 2.0 * (nd / n) -
    0.5 * ((nc - (n - 1.0)) / n) + 1.2 * (ns / n) AS quality_logit,
  (-1.5 + 0.01 * n + 2.0 * (nd / n) -
    0.5 * ((nc - (n - 1.0)) / n) + 1.2 * (ns / n)) > 0.0 AS keep
FROM f ORDER BY doc_id""",
    "text_boilerplate_drop" ->
      raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), doc AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0
      THEN ['subscribe to our newsletter for updates']
      ELSE CAST([] AS VARCHAR[]) END)
    || list_transform(range(0, CAST(ceil(len(ws) / 8.0) AS INT)),
         i -> array_to_string(ws[i*8+1:i*8+8], ' '))
    || (CASE WHEN doc_id % 5 = 0
      THEN ['all rights reserved legal notice footer']
      ELSE CAST([] AS VARCHAR[]) END) AS ls
  FROM tok
), lns AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS line_no, ls[i] AS line
  FROM doc, unnest(range(1, len(ls) + 1)) AS t(i)
), df AS (
  SELECT line, count(DISTINCT doc_id) AS df FROM lns GROUP BY 1
), kept AS (
  SELECT l.doc_id, l.line_no, l.line
  FROM lns l JOIN df ON l.line = df.line WHERE df.df <= 20
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
  string_agg(line, ' ' ORDER BY line_no) AS text
FROM kept GROUP BY doc_id ORDER BY doc_id""",
    "text_line_dedup_first" ->
      raw"""WITH tok AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), doc AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0
      THEN ['subscribe to our newsletter for updates']
      ELSE CAST([] AS VARCHAR[]) END)
    || list_transform(range(0, CAST(ceil(len(ws) / 8.0) AS INT)),
         i -> array_to_string(ws[i*8+1:i*8+8], ' '))
    || (CASE WHEN doc_id % 5 = 0
      THEN ['all rights reserved legal notice footer']
      ELSE CAST([] AS VARCHAR[]) END) AS ls
  FROM tok
), lns AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS line_no, ls[i] AS line
  FROM doc, unnest(range(1, len(ls) + 1)) AS t(i)
)
SELECT doc_id, line_no, line FROM (
  SELECT doc_id, line_no, line,
    row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM lns) WHERE rn = 1 ORDER BY doc_id, line_no""",
    "text_trigram_logprob" ->
      raw"""$trigramScoreCte
SELECT doc_id, n_tri, avg_logprob FROM docscore ORDER BY doc_id""",
    "text_perplexity_buckets" ->
      raw"""$trigramScoreCte, tiled AS (
  SELECT doc_id, n_tri, avg_logprob,
    ntile(3) OVER (ORDER BY avg_logprob, doc_id) AS tile
  FROM docscore
)
SELECT tile, count(*) AS n_docs, min(avg_logprob) AS min_lp,
  max(avg_logprob) AS max_lp, CAST(sum(n_tri) AS BIGINT) AS n_tri_total
FROM tiled GROUP BY tile ORDER BY tile""",
    "text_unigram_logprob" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest(list_filter($tokSql, w -> w <> '')) AS word
  FROM documents
), freq AS (
  SELECT word, count(*) AS c FROM tok GROUP BY word
), tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
SELECT doc_id, count(*) AS n_tokens,
  round(avg(ln(CAST(c AS DOUBLE) / (SELECT t FROM tot))), 4)
    AS avg_logprob
FROM tok JOIN freq USING (word)
GROUP BY doc_id ORDER BY doc_id""",
    "text_gopher_quality" ->
      raw"""WITH toks AS (
  SELECT doc_id, list_filter($tokSql, w -> w <> '') AS ws FROM documents
), base AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
    CAST(len(array_to_string(ws, '')) AS DOUBLE) / len(ws) AS mean_word_len
  FROM toks WHERE len(ws) > 0
), bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
      AS b
  FROM toks WHERE len(ws) >= 2
), g1 AS (
  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
), g2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, count(*) AS nd,
    CAST(max(c) AS BIGINT) AS tc
  FROM g1 GROUP BY 1
)
SELECT base.doc_id, n_words, mean_word_len,
  coalesce(nb, 0) AS n_bigrams,
  CAST(coalesce(nb - nd, 0) AS DOUBLE) / greatest(coalesce(nb, 0), 1)
    AS dup_bigram_frac,
  CAST(coalesce(tc, 0) AS DOUBLE) / greatest(coalesce(nb, 0), 1)
    AS top_bigram_frac,
  (n_words BETWEEN 20 AND 100000
    AND mean_word_len BETWEEN 3.0 AND 10.0
    AND CAST(coalesce(nb - nd, 0) AS DOUBLE) / greatest(coalesce(nb, 0), 1)
      < 0.05
    AND CAST(coalesce(tc, 0) AS DOUBLE) / greatest(coalesce(nb, 0), 1)
      < 0.06) AS keep
FROM base LEFT JOIN g2 ON base.doc_id = g2.doc_id
ORDER BY base.doc_id""",
    "text_keyword_topk" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest($tokSql) AS word FROM documents
), dw AS (
  SELECT DISTINCT doc_id, word FROM tok
  WHERE word <> '' AND word NOT IN $stopSql
)
SELECT word, count(*) AS cnt FROM dw GROUP BY word
ORDER BY cnt DESC, word LIMIT 100""",
    "text_inverted_index" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest($tokSql) AS word FROM documents
)
SELECT DISTINCT word, doc_id FROM tok
WHERE word <> '' AND word NOT IN $stopSql""",
    "text_quality_stats" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest($tokSql) AS word FROM documents
), agg AS (
  SELECT doc_id,
         count(*) FILTER (WHERE word <> '') AS n_tokens,
         count(DISTINCT word) FILTER (WHERE word <> '') AS n_distinct,
         count(*) FILTER (WHERE word <> '' AND word IN $stopSql) AS n_stop
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id, d.n_chars,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       COALESCE(a.n_stop, 0) AS n_stop,
       round(COALESCE(a.n_stop, 0) / GREATEST(COALESCE(a.n_tokens, 0), 1), 4) AS stop_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)""",
    "text_quality_blend" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest($tokSql) AS word FROM documents
), agg AS (
  SELECT doc_id,
         count(*) FILTER (WHERE word <> '') AS n_tokens,
         count(DISTINCT word) FILTER (WHERE word <> '') AS n_distinct,
         count(*) FILTER (WHERE word <> '' AND word IN $stopSql) AS n_stop
  FROM tok GROUP BY doc_id
), sig AS (
  SELECT d.doc_id,
         COALESCE(a.n_tokens, 0) * 1.0 AS s_len,
         COALESCE(a.n_distinct, 0) / GREATEST(COALESCE(a.n_tokens, 0), 1) AS s_div,
         COALESCE(a.n_stop, 0) / GREATEST(COALESCE(a.n_tokens, 0), 1) AS s_stop
  FROM documents d LEFT JOIN agg a USING (doc_id)
), st AS (
  SELECT round(avg(s_len), 6) AS m_len, round(stddev(s_len), 6) AS d_len,
         round(avg(s_div), 6) AS m_div, round(stddev(s_div), 6) AS d_div,
         round(avg(s_stop), 6) AS m_stop, round(stddev(s_stop), 6) AS d_stop
  FROM sig)
SELECT doc_id,
  round((s_len - m_len) / d_len, 4) AS z_len,
  round((s_div - m_div) / d_div, 4) AS z_div,
  round((s_stop - m_stop) / d_stop, 4) AS z_stop,
  round(((s_len - m_len) / d_len + (s_div - m_div) / d_div +
         (s_stop - m_stop) / d_stop) / 3, 4) AS blend
FROM sig, st ORDER BY doc_id""",
    "text_lang_stats" ->
      raw"""WITH tc AS (
  SELECT doc_id, lang, source, n_chars,
         len(list_filter($tokSql, w -> w <> '')) AS n_tokens
  FROM documents
)
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       count(DISTINCT source) AS n_sources
FROM tc GROUP BY lang ORDER BY lang""",
    "text_token_counts" ->
      raw"""WITH tc AS (
  SELECT source,
         len(list_filter($tokSql, w -> w <> '')) AS ws,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe
  FROM documents
)
SELECT source, CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS bpe_tokens, count(*) AS n_docs
FROM tc GROUP BY source ORDER BY source""")
}
