package graft

import org.apache.spark.sql.functions._

import graft.operators.ChunkDedup
import graft.text.TextOps

/** Invariants for sub-document chunk dedup (the DuckDB oracle pins the
  * exact output; these pin the semantics that make it a dedup).
  */
class ChunkDedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val out =
    ChunkDedup.dedupChunks(docs, "doc_id", "text", unit = 10).cache()

  test("documents with no removed chunks reassemble to the tokenized original") {
    val expected = docs.select(col("doc_id"),
      array_join(TextOps.tokens(col("text")), " ").as("norm_text"))
    val full = out.where(col("n_kept") === col("n_chunks"))
      .join(expected, "doc_id")
    assert(full.count() > 0, "corpus should contain fully-unique docs")
    assert(full.where(col("dedup_text") =!= col("norm_text")).count() === 0)
  }

  test("every distinct chunk text survives exactly once corpus-wide") {
    val totalKept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctChunks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(posexplode(transform(
        sequence(lit(0),
          floor((size(col("toks")) + lit(9)) / lit(10)).cast("int") - lit(1)),
        i => array_join(slice(col("toks"), i * 10 + 1, lit(10)), " "))))
      .select(countDistinct(col("col"))).collect()(0).getLong(0)
    assert(totalKept === distinctChunks)
  }

  test("kept never exceeds total and every doc row is present") {
    assert(out.where(col("n_kept") > col("n_chunks")).count() === 0)
    assert(out.count() === docs.where(length(trim(col("text"))) > 0).count())
  }
}
