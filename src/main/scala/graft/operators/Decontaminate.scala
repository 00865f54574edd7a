package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share n-gram
  * evidence with a held-out evaluation set — the step a training-data
  * pipeline runs so eval answers don't leak into the corpus (public
  * practice: GPT-3 appendix C / The Pile / FineWeb dedup-style 13-gram
  * overlap checks; here trigrams to match the corpus's shingle stack).
  *
  * Shape at 100 TB: the BENCHMARK side is small by contract (eval sets
  * are thousands of docs), so its distinct shingle-hash set broadcasts
  * (~8 B/hash); the corpus side streams through one explode + hash
  * semi-join + per-doc count — no corpus-sized shuffle at all, because
  * `Dedup.shingled`'s doc_id repartition already co-locates the
  * per-doc aggregation.
  */
object Decontaminate {

  /** (doc_id, n_shared) for every corpus doc sharing >= 1 distinct
    * shingle with the benchmark; count is over DISTINCT shared
    * shingles (both sides are per-doc distinct already).
    */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cs = Dedup.shingled(corpus, idCol, textCol)
      .select(col("doc_id"), explode(col("shs")).as("s"))
    val bs = Dedup.shingled(bench, idCol, textCol)
      .select(explode(col("shs")).as("s")).distinct()
    cs.join(broadcast(bs), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Corpus docs flagged contaminated at `minShared` distinct shared
    * shingles. Join back to `corpus` (or anti-join) for the clean set.
    */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Long): DataFrame =
    overlap(corpus, bench, idCol, textCol)
      .where(col("n_shared") >= minShared)

  /** The decontaminated corpus: drop flagged docs. */
  def clean(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minShared: Long): DataFrame = {
    val bad = flag(corpus, bench, idCol, textCol, minShared)
      .select(col("doc_id").as(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
