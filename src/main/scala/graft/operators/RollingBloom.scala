package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Rolling, mergeable bloom snapshots over a persisted index's key
  * column — the screen that makes incremental probes sub-linear in
  * history (see the LSH `keybloom/` rationale in [[Dedup]]): index
  * keys are uniform hashes, so partition pruning alone is vacuous for
  * any realistic batch; the bloom first drops every batch key provably
  * absent (no false negatives), and only the survivors' prefixes touch
  * the index.
  *
  * Lifecycle mirrors the batch=<id> index subtrees: each append writes
  * a MERGED snapshot to its own `bloom-<id>.bin` (overwrite-on-replay
  * idempotent; content is a pure function of the keys since insertion
  * is bit-OR), probes read the newest snapshot excluding their own
  * batch, and all snapshots of one directory share the same
  * (capacity, fpp) so they stay bit-compatible for mergeInPlace.
  * Loaded blooms cache per (path, mtime, length) — appends always roll
  * a new file, so staleness is impossible.
  */
object RollingBloom {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), BloomFilter]()

  private def file(dir: String, batch: Option[Long]) =
    new org.apache.hadoop.fs.Path(batch match {
      case Some(id) => s"$dir/bloom-$id.bin"
      case None => s"$dir/bloom-base.bin"
    })

  /** Merge `keys`' column `keyCol` into the rolling bloom and write
    * this batch's snapshot. Capacity/fpp must be constant per
    * directory (mergeInPlace requires identical bit geometry); an
    * over-full bloom degrades fpp — weaker pruning, never wrong
    * results.
    */
  def roll(spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String, batch: Option[Long], capacity: Long,
      fpp: Double): Unit = {
    // stat.bloomFilter NPEs on zero rows (null agg buffer), and
    // sketch.BloomFilter.create builds a geometry incompatible with
    // the stat aggregate's V2 impl — so an EMPTY batch (e.g. a
    // micro-batch fully dropped by upstream filters) re-writes the
    // previous snapshot unchanged (keeps the snapshot-per-batch
    // lifecycle monotone) or, with no history either, rolls nothing
    val prev = read(spark, dir, excludeBatch = batch)
    val merged =
      if (keys.isEmpty) prev match {
        case Some(b) => b
        case None => return
      } else {
        // merge INTO the fresh batch bloom, never into `prev`: read()
        // hands out the cached instance, and mutating it would pollute
        // every later reader of the older snapshot (weaker pruning — a
        // bloom can only over-approximate — but a shared-cache
        // mutation trap all the same)
        val batchBloom = keys.stat.bloomFilter(keyCol, capacity, fpp)
        prev.foreach(batchBloom.mergeInPlace)
        batchBloom
      }
    val p = file(dir, batch)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try merged.writeTo(out) finally out.close()
  }

  /** Newest snapshot, excluding the given batch's own (replay safety).
    * None = no bloom yet — callers skip the pre-filter, which is
    * correct, just unpruned.
    */
  def read(spark: SparkSession, dir: String,
      excludeBatch: Option[Long] = None): Option[BloomFilter] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return None
    val re = "bloom-(base|\\d+)\\.bin".r
    val ids = fs.listStatus(d).toSeq.map(_.getPath.getName).collect {
      case re(s) => if (s == "base") -1L else s.toLong
    }
    val usable = ids.filterNot(excludeBatch.contains)
    if (usable.isEmpty) None
    else {
      val p = file(dir, usable.max match {
        case n if n < 0 => None
        case n => Some(n)
      })
      val st = fs.getFileStatus(p)
      val key = (p.toString, st.getModificationTime, st.getLen)
      Some(cache.computeIfAbsent(key, _ => {
        val in = fs.open(p)
        try BloomFilter.readFrom(in) finally in.close()
      }))
    }
  }

  /** Drop every snapshot in `dir` (compaction: the caller rebuilds one
    * fresh snapshot from the compacted index, resetting fpp drift from
    * replay-superseded files).
    */
  def clear(spark: SparkSession, dir: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    d.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(d, true)
  }
}
