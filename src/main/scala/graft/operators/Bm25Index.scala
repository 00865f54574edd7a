package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Persisted BM25 index — the retrieval counterpart of the persisted
  * LSH / IVF indexes: tokenize and count ONCE at build time, then any
  * number of query-term probes touch only the postings files whose
  * term range can match.
  *
  * Layout under `path`:
  *   - `postings/` — (term, doc_id, dl, tf), repartitionByRange(term)
  *     + sortWithinPartitions(term): every parquet file covers a tight
  *     term range, so a probe's `term IN (...)` prunes via row-group
  *     min/max stats instead of scanning the vocabulary.
  *   - `dfs/`      — (term, dft) document frequencies.
  *   - `stats/`    — mergeable (n_docs, sum_dl) partial rows.
  *
  * A probe reads |q| terms' postings (file-skipped), broadcasts the
  * |q|-row df table and the 1-row stats, and runs one per-doc hash agg
  * + top-k — work proportional to the query's posting lists, never the
  * corpus. Scoring arithmetic is kept op-for-op identical to the
  * ad-hoc `TextQueries.bm25TopK` so the two paths agree exactly
  * (spec-pinned).
  */
object Bm25Index {

  // one row per doc BEFORE the explode — docs that tokenize to zero
  // tokens keep their row, so index stats count them exactly like the
  // ad-hoc bm25TopK does (r3 advisor: the two paths share one oracle)
  private def tokenizedDocs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        col("ws"))
      .localCheckpoint(true) // every consumer shares one tokenize pass

  // stats are stored MERGEABLE — (n_docs, sum_dl), never a pre-divided
  // average — so appends add partials instead of rebuilding; avgdl is
  // derived at query time
  private def writeDerived(toks: DataFrame, path: String,
      mode: String): Unit = {
    val postings = toks
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint(true)
    postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode(mode).parquet(s"$path/postings")
    postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("dft"))
      .write.mode(mode).parquet(s"$path/dfs")
    // from the PRE-explode doc list: a dl=0 doc contributes n_docs+1
    // (sum_dl coalesced for the empty-batch append edge)
    toks.agg(count(lit(1)).cast("double").as("n_docs"),
        coalesce(sum("dl"), lit(0.0)).as("sum_dl"))
      .write.mode(mode).parquet(s"$path/stats")
  }

  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    writeDerived(tokenizedDocs(docs, idCol, textCol), path, "overwrite")

  /** Incremental maintenance: a new document batch appends its own
    * postings files and its own df/stats PARTIAL rows — batch-sized
    * work, no corpus re-tokenization, no rewrite of existing files.
    * The query path re-aggregates the (term, dft) partials and the
    * (n_docs, sum_dl) partials at probe time (|q| + #appends rows —
    * trivial forever).
    *
    * Batches must carry previously-unseen doc_ids; re-ingesting a doc
    * double-counts it. `dedupeAgainstExisting=true` enforces that with
    * an anti-join against the index's own postings doc_ids (one scan of
    * the doc_id column, index-sized not corpus-sized — the
    * `Sinks.notYetWritten` pattern applied at the index boundary).
    * Caveat: a previously-ingested ZERO-token doc has no postings row,
    * so the guard cannot see it; its re-ingest would re-count it in
    * stats (n_docs). Zero-token docs are corpus noise at that level —
    * dedupe upstream if they matter.
    */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, dedupeAgainstExisting: Boolean = false): Unit = {
    val batch =
      if (!dedupeAgainstExisting) docs
      else {
        val seen = docs.sparkSession.read.parquet(s"$path/postings")
          .select(col("doc_id")).distinct()
        docs.join(seen, docs(idCol) === seen("doc_id"), "left_anti")
      }
    writeDerived(tokenizedDocs(batch, idCol, textCol), path, "append")
  }

  /** Top-k BM25 over the persisted index; identical arithmetic to the
    * ad-hoc path (k1=1.2, b=0.75, rank cut on the rounded score).
    */
  def query(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("term").isInCollection(terms))
    // merge the per-append partials (a handful of rows) at probe time
    val dfs = spark.read.parquet(s"$path/dfs")
      .where(col("term").isInCollection(terms))
      .groupBy("term").agg(sum("dft").as("dft"))
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs").as("n_docs"),
        (sum("sum_dl") / sum("n_docs")).as("avgdl"))
    postings.join(broadcast(dfs), "term")
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
      .limit(k)
  }
}
