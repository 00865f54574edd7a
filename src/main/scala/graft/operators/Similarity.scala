package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale posture: the query set is always the broadcast side (ANN
  * queries are few, the corpus is the 100 TB side), so brute force is a
  * single pass over the corpus with no shuffle before the per-query
  * top-k. The LSH variant prunes that pass to bucket-join candidates:
  * corpus and queries are hashed to sign-pattern buckets and candidates
  * come from an equi-join on (table, bucket) — never a cross join.
  */
object Similarity {

  /** Brute-force cosine top-k: corpus scan x broadcast queries ->
    * per-query top-k window. Similarities rounded to 6dp BEFORE ranking
    * so ranking is stable across engines (ties broken by vec_id).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qemb")))
    val sims = corpus.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(VectorOps.cosine(col("qemb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims
      .select(col("qid"), col("vec_id"), col("sim"),
        row_number().over(w).cast("long").as("rank"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** Deterministic random hyperplanes: tables x bitsPerTable planes of
    * `dim` components in [-1, 1). Seeded so plans are reproducible.
    */
  private def planes(tables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(tables, bitsPerTable, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bit bucket ids, one per table, for an embedding column. */
  private def bucketCols(emb: Column, pl: Seq[Seq[Seq[Double]]]): Column =
    array(pl.map { table =>
      table.zipWithIndex.map { case (plane, b) =>
        when(VectorOps.dot(emb, typedLit(plane)) > 0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** LSH-pruned ANN: random-hyperplane bucketing -> candidate equi-join
    * on (table, bucket) -> exact cosine re-rank, top-k per query.
    */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 16, bitsPerTable: Int = 6, dim: Int = 64): DataFrame = {
    val pl = planes(tables, bitsPerTable, dim)
    def buckets(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(
          col("vec_id").as(idAs), col("embedding").as(embAs),
          posexplode(bucketCols(col("embedding"), pl)))
        .toDF(idAs, embAs, "tbl", "bucket")
    val cb = buckets(corpus, "vec_id", "emb")
    val qb = broadcast(buckets(queries, "qid", "qemb"))
    val cand = cb.join(qb,
        cb("tbl") === qb("tbl") && cb("bucket") === qb("bucket") &&
          col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("vec_id"), col("emb"))
      .dropDuplicates("qid", "vec_id")
    val sims = cand.select(col("qid"), col("vec_id"),
      round(VectorOps.cosine(col("qemb"), col("emb")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    sims
      .select(col("qid"), col("vec_id"), col("sim"),
        row_number().over(w).cast("long").as("rank"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-dup pairs (the embedding flavor of dedup):
    * LSH-bucket candidates, keep pairs with cosine >= threshold.
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
      tables: Int = 8, bitsPerTable: Int = 8, dim: Int = 64): DataFrame = {
    val pl = planes(tables, bitsPerTable, dim)
    val b = corpus.select(
        col("vec_id"), col("embedding"),
        posexplode(bucketCols(col("embedding"), pl)))
      .toDF("vec_id", "embedding", "tbl", "bucket")
    val cand = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("ida"), col("a.embedding").as("ea"),
        col("b.vec_id").as("idb"), col("b.embedding").as("eb"))
      .dropDuplicates("ida", "idb")
    cand
      .select(col("ida"), col("idb"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy("ida", "idb")
  }
}
