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
  *   - `stats/`    — single row (n_docs, avgdl).
  *
  * A probe reads |q| terms' postings (file-skipped), broadcasts the
  * |q|-row df table and the 1-row stats, and runs one per-doc hash agg
  * + top-k — work proportional to the query's posting lists, never the
  * corpus. Scoring arithmetic is kept op-for-op identical to the
  * ad-hoc `TextQueries.bm25TopK` so the two paths agree exactly
  * (spec-pinned).
  */
object Bm25Index {

  def write(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("term"))
    val postings = toks
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint(true) // dfs + the write below share one pass
    postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("dft"))
      .write.mode("overwrite").parquet(s"$path/dfs")
    postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Top-k BM25 over the persisted index; identical arithmetic to the
    * ad-hoc path (k1=1.2, b=0.75, rank cut on the rounded score).
    */
  def query(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("term").isInCollection(terms))
    val dfs = spark.read.parquet(s"$path/dfs")
      .where(col("term").isInCollection(terms))
    val stats = spark.read.parquet(s"$path/stats")
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
