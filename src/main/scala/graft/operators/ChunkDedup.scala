package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Sub-document (chunk / paragraph / line granularity) exact
  * deduplication — the CCNet-style corpus cleanup where repeated
  * boilerplate units are removed ACROSS the whole corpus and each
  * document is reassembled from its surviving units, rather than
  * dropping whole documents.
  *
  * The unit splitter is a parameter: real corpora split on newlines or
  * sentence boundaries; the harness corpus is single-line, so the
  * registered query uses fixed `unit`-token windows, which exercises the
  * identical plan shape.
  *
  * Scale posture (100 TB): the chunk table is a constant factor larger
  * than the corpus but every stage is an equi-shuffle on a
  * high-cardinality key — first-occurrence election is a row_number
  * window PARTITIONED BY chunk text (per-key sort, never a global
  * ordering), reassembly a groupBy(doc). One scan of the corpus total:
  * the window flags winners in place, so there is no keeper join-back
  * (the groupBy+join formulation reads the corpus twice — .explain
  * showed two Generate branches — and tempts the planner into
  * broadcasting a corpus-sized keeper table).
  */
object ChunkDedup {

  /** Returns one row per input document:
    * (doc_id, n_chunks, n_kept, dedup_text) where dedup_text is the
    * document with every chunk that already occurred earlier in the
    * corpus (by (doc, chunk_idx) order) removed.
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String,
      unit: Int = 10): DataFrame = {
    // Materialization barrier: tokens are computed ONCE per document
    // before the per-chunk fan-out (interpreted HOF lambdas re-evaluate
    // alias subtrees per element — see docs/SCALING.md).
    val toked = docs
      .select(col(idCol).as("_id"), TextOps.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .repartition(col("_id"))

    val chunks = toked.select(
        col("_id"),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("_toks")) + lit(unit - 1)) / lit(unit)).cast("int")
              - lit(1)),
          i => array_join(slice(col("_toks"), i * unit + 1, lit(unit)), " "))))
      .toDF("_id", "chunk_idx", "chunk_text")

    // First occurrence of each distinct chunk text wins: rank within
    // the chunk-text partition by (doc, idx) — high-cardinality key,
    // so the window parallelizes like a hash shuffle.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk_text").orderBy("_id", "chunk_idx")
    chunks
      .withColumn("_keep",
        when(row_number().over(w) === 1, lit(1)).otherwise(lit(null)))
      .groupBy("_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        coalesce(sum(col("_keep")), lit(0)).cast("long").as("n_kept"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(
                struct(col("chunk_idx"), col("chunk_text"), col("_keep")))),
              x => x.getField("_keep") === 1),
            x => x.getField("chunk_text")),
          " ").as("dedup_text"))
      .withColumnRenamed("_id", idCol)
  }
}
