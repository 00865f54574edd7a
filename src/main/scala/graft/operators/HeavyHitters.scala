package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Approximate frequent-item (heavy-hitter) mining for unbounded key
  * domains.
  *
  * An exact `groupBy(item).count.orderBy.limit(k)` shuffles one row
  * per DISTINCT item — fine for a 31-word toy vocabulary, unbounded
  * for real corpora (token/URL/ngram domains run into the billions at
  * 100 TB). This operator bounds every stage instead:
  *
  *  1. candidates: per-partition Misra-Gries summaries (m counters per
  *     partition, O(m) memory). Pigeonhole guarantee: any item with
  *     global count > N/(m+1) exceeds n_p/(m+1) in at least one
  *     partition, so it survives somewhere — the union of partition
  *     summaries (≤ m × partitions rows, e.g. 64×1000 at cluster
  *     scale) is a superset of every true heavy hitter.
  *  2. ranking: either a count-min-sketch probe (one extra scan, no
  *     shuffle at all — the sketch is depth×width counters merged on
  *     the driver) or an exact recount restricted to the candidate set
  *     (broadcast semi join; the shuffle carries ≤ candidates ×
  *     partitions partial counts, not the raw domain).
  *
  * Mirrors the public Misra-Gries / CMS literature (Cormode &
  * Muthukrishnan, "An improved data stream summary") — both summaries
  * are mergeable, which is what makes them cluster-shaped.
  */
object HeavyHitters {

  /** Union of per-partition Misra-Gries candidate sets over a string
    * column; output column `item`, ≤ m distinct items per input
    * partition.
    */
  def candidates(items: DataFrame, c: String, m: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(c).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          if (s != null) {
            counts.get(s) match {
              case Some(n) => counts.update(s, n + 1)
              case None if counts.size < m => counts.update(s, 1L)
              case None =>
                // decrement-all eviction; amortized O(1) per input row
                val dead = mutable.ArrayBuffer.empty[String]
                counts.foreach { case (k, v) =>
                  if (v == 1L) dead += k else counts.update(k, v - 1)
                }
                dead.foreach(counts.remove)
            }
          }
        }
        counts.keysIterator
      }
      .toDF("item").distinct()
  }

  /** Top-k by count-min-sketch estimate: ONE aggregate-free extra pass
    * builds the sketch; candidates are probed on the driver (bounded
    * set). Estimates are deterministic for a fixed seed and
    * one-sided: est ∈ [true, true + eps·N] with prob `confidence`.
    */
  def approxTopK(items: DataFrame, c: String, k: Int, m: Int = 64,
      eps: Double = 1e-3, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = items.sparkSession
    val sketch = items.stat.countMinSketch(col(c).cast("string"), eps,
      confidence, seed)
    val cand = candidates(items, c, m).collect().map(_.getString(0))
    val ranked = cand
      .map(s => (s, sketch.estimateCount(s)))
      .sortBy { case (s, n) => (-n, s) }
      .take(k)
    spark.createDataFrame(
      spark.sparkContext.parallelize(ranked.toIndexedSeq.map {
        case (s, n) => Row(s, n)
      }, 1),
      StructType(Seq(StructField("item", StringType),
        StructField("est_cnt", LongType))))
  }

  /** Top-k by EXACT recount of the candidate set — same result as the
    * unbounded groupBy top-k whenever every true top-k item clears the
    * N/(m+1) candidate guarantee, at candidate-bounded shuffle cost.
    */
  def exactTopK(items: DataFrame, c: String, k: Int, m: Int = 64): DataFrame = {
    val cand = candidates(items, c, m)
    items.select(col(c).cast("string").as("item"))
      .join(broadcast(cand), "item")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
  }
}
