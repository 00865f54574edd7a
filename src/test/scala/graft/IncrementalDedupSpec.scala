package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental batch-vs-corpus dedup through the persisted LSH index
  * must agree exactly with the cross-batch slice of a full-corpus run
  * (band seeds are baked into the expression, so collisions are
  * reproducible across the split).
  */
class IncrementalDedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents").cache()

  test("index probe equals the cross-split slice of the full run; append extends it") {
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(5)) === 0)
    val dir = Files.createTempDirectory("graft-lsh-idx").toString

    Dedup.writeLshIndex(corpus, "doc_id", "text", dir)
    val got = Dedup.dedupAgainstIndex(batch, "doc_id", "text", dir, 0.5)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet

    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val crossSplit = full.filter { case (a, b) =>
      (a % 5 == 0) != (b % 5 == 0)
    }.toSet
    assert(crossSplit.nonEmpty,
      "planted near-dups should span the 80/20 split")
    assert(got === crossSplit)

    // append the batch, re-probe it: self pairs are suppressed, and the
    // within-batch slice of the full run now also surfaces
    Dedup.appendToLshIndex(batch, "doc_id", "text", dir)
    val reprobe = Dedup.dedupAgainstIndex(batch, "doc_id", "text", dir, 0.5)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val withinBatch = full.filter { case (a, b) =>
      a % 5 == 0 && b % 5 == 0
    }.toSet
    assert(reprobe === crossSplit ++ withinBatch)
  }
}
