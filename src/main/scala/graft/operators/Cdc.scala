package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture table maintenance: log compaction, incremental
  * snapshot merge, and slowly-changing-dimension (SCD type 2) history.
  *
  * The data model is the compacted-changelog one (a keyed stream of
  * upserts and delete tombstones with a globally-ordered sequence
  * column — the shape a CDC feed or a compacted Kafka topic delivers;
  * the reference's ingest keyed by monotone blob names is the same
  * contract, `job_pubmed_submit.py:63-70`):
  *
  *   - a SNAPSHOT is "latest record per key, tombstones RETAINED".
  *     Keeping the tombstone is what makes incremental maintenance
  *     closed: a late/stale change for a deleted key loses to the
  *     tombstone's higher sequence instead of resurrecting the row.
  *     (`current` strips tombstones at read time.)
  *   - [[compact]] builds a snapshot from raw history in one shuffle;
  *   - [[applyChangelog]] merges a batch into an existing snapshot with
  *     batch-sized aggregation work, and is equivalent to re-compacting
  *     the full history (the spec proves `apply(compact(old), new) ==
  *     compact(old ∪ new)` row-for-row) while touching none of it;
  *   - [[scd2]] turns the same changelog into a versioned-history
  *     dimension table (valid_from/valid_to/is_current).
  *
  * Scale: `compact` is one hash shuffle of the history with map-side
  * partial `max_by`. `applyChangelog` collapses the batch with a
  * batch-sized shuffle, then full-outer-joins the snapshot on the key —
  * one snapshot-sized exchange, or ZERO when the snapshot is stored
  * bucketed on the key (`BucketingSpec` pins the exchange-free join);
  * pair with `Sinks.upsertPartitions` so only partitions holding
  * changed keys are rewritten. `scd2` is one shuffle + sort per key —
  * the minimum for an ordered-history construction.
  */
object Cdc {

  /** Latest record per key, delete tombstones retained. Ties on
    * `seqCol` (exact redelivery) are content-identical by the CDC
    * contract, so either row is the same row.
    */
  def compact(changes: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    val payload = changes.columns.filterNot(keys.contains).toSeq
    changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(seqCol)).as("_latest"))
      .select(keys.map(col) ++ payload.map(p => col(s"_latest.$p").as(p)): _*)
  }

  /** Merge a changelog batch into a snapshot (both in [[compact]]'s
    * shape — at most one row per key, tombstones retained). Per key the
    * highest-sequence record wins wherever it came from: out-of-order
    * redelivery of an already-superseded change is a no-op, and
    * re-applying the same batch is idempotent.
    */
  def applyChangelog(snapshot: DataFrame, batch: DataFrame,
      keys: Seq[String], seqCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    require(batch.columns.sorted.sameElements(snapshot.columns.sorted),
      "batch and snapshot must share one schema")
    val latest = compact(batch, keys, seqCol)
    val joined = snapshot.as("s").join(latest.as("c"), keys, "full_outer")
    val changeWins = col(s"c.$seqCol").isNotNull &&
      (col(s"s.$seqCol").isNull || col(s"c.$seqCol") >= col(s"s.$seqCol"))
    joined.select(
      keys.map(col) ++ payload.map(p =>
        when(changeWins, col(s"c.$p")).otherwise(col(s"s.$p")).as(p)): _*)
  }

  /** Read-time view of a snapshot: live rows only. */
  def current(snapshot: DataFrame, opCol: String): DataFrame =
    snapshot.where(col(opCol) =!= "D").drop(opCol)

  /** SCD type-2 history: every upsert becomes a version row valid from
    * its own sequence until the NEXT change to the key (delete or not);
    * open-ended versions are current. A key whose last change is a
    * delete has every version closed — deletes shape the intervals but
    * emit no row themselves.
    */
  def scd2(changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(seqCol)
    changes
      .withColumn("valid_to_seq", lead(seqCol, 1).over(w))
      .withColumn("is_current", col("valid_to_seq").isNull)
      .where(col(opCol) =!= "D")
      .withColumnRenamed(seqCol, "valid_from_seq")
      .drop(opCol)
  }
}
