package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE lifecycle every persisted graft index shares — LSH bands +
  * shingles ([[Dedup]]), the md5 digest ledger and ingest watermark
  * ([[graft.streaming.StreamingFunnel]]), BM25 postings + id ledger
  * ([[Bm25Index]]). Three hand-rolled copies of meta handling and the
  * build-aside/rename-swap compaction had already drifted once (the
  * hash meta recorded fewer layout params than the LSH meta, and bloom
  * geometry was recorded nowhere); this module is the single
  * implementation.
  *
  * Two primitives:
  *
  *  1. **Props files** — tiny `key=value` text files next to the data
  *     recording every layout parameter a future reader must NOT take
  *     from the live conf (prefix moduli, banding params, bloom
  *     geometry). The rule all indexes follow: parameters are read at
  *     WRITE time, recorded once, and probes/appends always use the
  *     recorded value — a conf change can never mis-prune or
  *     mis-partition an existing index.
  *
  *  2. **Generation-pointer compaction** — `compactInto` builds the
  *     compacted tree COMPLETELY under `<dir>/gen-<n>`, then commits
  *     by atomically renaming a one-line pointer file over
  *     `<dir>/_graft_current`. The live directory is NEVER renamed or
  *     absent: a reader that resolved the old generation keeps reading
  *     intact files (the previous generation is retained until the
  *     next compaction by default — Iceberg-style snapshot retention,
  *     `spark.graft.index.keepPreviousGeneration=false` reclaims it
  *     immediately for storage-tight single-reader deployments), and a
  *     crash at ANY point leaves either the old pointer (partial build
  *     ignored, rebuilt next time) or the new pointer (fully-built
  *     tree). This closes the old two-rename swap's window where the
  *     index path was briefly absent — and, worse, where a crash
  *     parked history at `<dir>.precompact` and the next append
  *     mistook the empty live path for index creation
  *     ([[recoverLegacySwap]] heals exactly that state for indexes
  *     written by the old code).
  *
  * Every path an index reads or writes goes through [[resolveRoot]]:
  * identity for a never-compacted (legacy-layout) directory, the
  * current generation subtree after the first compaction.
  */
object IndexLifecycle {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fsOf(spark, p).exists(p)
  }

  // ---- props files ------------------------------------------------

  /** Write `props` as `key=value` lines to `file` (overwrite). */
  def writeProps(spark: SparkSession, file: String,
      props: Seq[(String, String)]): Unit = {
    val p = new Path(file)
    val out = fsOf(spark, p).create(p, true)
    try out.write(props.map { case (k, v) => s"$k=$v\n" }.mkString
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** The `key=value` lines of `file`; None if absent (legacy/unknown
    * layout — callers fall back to unpruned reads, never guess).
    */
  def readProps(spark: SparkSession, file: String)
      : Option[Map[String, String]] = {
    val p = new Path(file)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.linesIterator.filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }
        .toMap)
    }
  }

  // ---- prefix-modulus derivation ----------------------------------

  /** Target on-disk bytes per hash-prefix partition when DERIVING a
    * prefix modulus — `spark.graft.index.prefixTargetBytes`, default
    * 128 MB (a comfortable parquet split: big enough that listing cost
    * stays trivial, small enough that a probe touching few prefixes
    * reads little).
    */
  def prefixTargetBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.prefixTargetBytes")
      .map(_.toLong).getOrElse(128L << 20)

  /** Derive a prefix modulus from a byte-size estimate of the data to
    * be partitioned: the next power of two of bytes/target, clamped to
    * [16, 65536]. Power-of-two keeps the modulus stable under small
    * estimate drift; the floor preserves the probe plan shape on tiny
    * corpora, the cap bounds directory fan-out. Estimates that look
    * like "unknown" (Catalyst's Long.MaxValue default — anything past
    * 1 PiB) fall back to the floor: a genuinely PiB-scale corpus
    * should set `spark.graft.lsh.indexPrefixes` explicitly rather
    * than inherit a 65536-way fan-out from a missing statistic.
    */
  def derivePrefixes(spark: SparkSession, bytes: BigInt): Int = {
    if (bytes <= 0 || bytes > (BigInt(1L) << 50)) return 16
    val target = prefixTargetBytes(spark)
    val raw = ((bytes + target - 1) / target).toLong
    val pow2 = java.lang.Long.highestOneBit(math.max(raw, 1L)) *
      (if (java.lang.Long.bitCount(math.max(raw, 1L)) > 1) 2L else 1L)
    math.min(65536L, math.max(16L, pow2)).toInt
  }

  /** Modulus for a MERGED run in the tiered lifecycle
    * ([[RunManifest]]): None below one [[prefixTargetBytes]] worth of
    * data — partitioning a small run only multiplies file count while
    * a probe reads it whole anyway — else the next power of two of
    * bytes/target, capped. No 16-floor here (that floor exists to keep
    * whole-index plan shapes stable); per-run moduli are recorded in
    * the manifest, so each run prunes at exactly its own scale.
    */
  def derivePrefixesForRun(spark: SparkSession,
      bytes: BigInt): Option[Int] = {
    if (bytes <= 0 || bytes > (BigInt(1L) << 50)) return None
    val target = prefixTargetBytes(spark)
    val raw = ((bytes + target - 1) / target).toLong
    if (raw <= 1L) None
    else Some(math.min(65536L,
      java.lang.Long.highestOneBit(raw) *
        (if (java.lang.Long.bitCount(raw) > 1) 2L else 1L)).toInt)
  }

  /** Recursive on-disk byte size of `path` (0 if absent) — the REAL
    * size compaction re-derives the modulus from.
    */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  // ---- generation pointer -----------------------------------------

  private val pointerName = "_graft_current"
  private val genPrefix = "gen-"
  // present when compactInto RETAINED the legacy root-level entries as
  // the oldest snapshot: they serve in-flight readers that resolved the
  // legacy root before the first commit, but they are NOT live data —
  // resolveRoot must not fall back to them when the pointer is missing
  private val legacyRetainedName = "_graft_legacy_retained"

  /** Keep the previous generation after a compaction commit (default
    * true — a reader that resolved the old generation mid-compaction
    * keeps reading intact files until the NEXT compaction; the cost is
    * one extra index copy between compactions, the standard snapshot-
    * retention bargain). `false` deletes it at commit: right for
    * single-reader deployments that prefer the storage back.
    */
  def keepPreviousGeneration(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.index.keepPreviousGeneration")
      .forall(_.toBoolean)

  /** Number of PREVIOUS generations retained after a compaction commit
    * — `spark.graft.index.keepGenerations`, default 1 (equivalent to
    * `keepPreviousGeneration=true`; that boolean still works and maps
    * to 1/0 when this conf is unset). `N` covers a reader whose query
    * spans up to N compaction cycles: it keeps reading intact files
    * even if N commits land mid-query. `0` reclaims everything but the
    * new generation at commit. The same count also sets how many
    * maintenance cycles a folded run lingers before deletion in the
    * tiered-run lifecycle ([[RunManifest]]).
    */
  def keepGenerations(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.index.keepGenerations")
      .map(_.toInt.max(0))
      .getOrElse(if (keepPreviousGeneration(spark)) 1 else 0)

  /** The physical root of the index's CURRENT data: `<dir>/gen-<n>`
    * when the generation pointer exists, `dir` itself otherwise (the
    * legacy layout every index starts in — the pointer first appears
    * at the first compaction). Resolution is one small-file read; the
    * pointer is committed by atomic rename, so a reader sees either
    * the old or the new generation, never a torn state.
    *
    * Defense for filesystems WITHOUT atomic rename-over-existing
    * (where the commit degrades to delete+rename): a missing pointer
    * next to existing `gen-*` dirs is retried briefly, then — if the
    * directory also has no legacy-layout entries to fall back to —
    * fails loudly instead of resolving to an empty root. (Gen dirs
    * WITH legacy entries is the normal mid-FIRST-compaction build
    * state: the legacy tree is still the committed data there.)
    */
  def resolveRoot(spark: SparkSession, dir: String): String = {
    var attempt = 0
    while (true) {
      readProps(spark, s"$dir/$pointerName").flatMap(_.get("gen")) match {
        case Some(n) => return s"$dir/$genPrefix$n"
        case None =>
          val gens = listGens(spark, dir)
          if (gens.isEmpty) return dir
          val d = new Path(dir)
          val names = fsOf(spark, d).listStatus(d).map(_.getPath.getName)
          // a retained-snapshot marker means the legacy entries are a
          // superseded generation, not live data — never resolve there
          val hasLegacy = !names.contains(legacyRetainedName) &&
            names.exists(n => !n.startsWith(genPrefix) &&
              !n.startsWith(pointerName))
          if (hasLegacy) return dir
          if (attempt >= 3) throw new IllegalStateException(
            s"$dir has generation dirs (${gens.sorted.mkString(",")}) " +
              "but no _graft_current pointer and no legacy data — a " +
              "non-atomic pointer swap was interrupted; restore " +
              "_graft_current (gen=<newest complete generation>)")
          attempt += 1
          Thread.sleep(50L * attempt)
      }
    }
    dir // unreachable
  }

  /** The committed generation number, None while in legacy layout. */
  def currentGen(spark: SparkSession, dir: String): Option[Long] =
    readProps(spark, s"$dir/$pointerName").flatMap(_.get("gen"))
      .map(_.toLong)

  private def listGens(spark: SparkSession, dir: String): Seq[Long] = {
    val d = new Path(dir)
    val fs = fsOf(spark, d)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith(genPrefix) =>
        s.stripPrefix(genPrefix).toLong }
  }

  /** Compact `dir` by building a fresh generation and atomically
    * flipping the pointer to it.
    *
    * `build` receives the new generation's root and must write the
    * COMPLETE index tree there (data, metas, blooms — everything
    * [[resolveRoot]]-relative); it reads the current data via
    * [[resolveRoot]] as usual. The commit is one atomic rename of the
    * pointer file; afterwards only the newest [[keepGenerations]]
    * previous generations are retained (plus any stale partial from a
    * crashed build is always removed). The legacy root-level entries
    * matched by `legacyEntry` count as the OLDEST generation: with
    * retention on they survive the first compaction(s) and are removed
    * only once the retention window is full of real generations — so
    * even the legacy→gen transition never strands an in-flight reader
    * of the old layout (r12's one reader-unsafe step, closed). Single
    * writer by contract, like every index mutation here.
    */
  def compactInto(spark: SparkSession, dir: String)
      (legacyEntry: String => Boolean)(build: String => Unit): Long = {
    recoverLegacySwap(spark, dir)
    val cur = currentGen(spark, dir)
    // max over ALL gen dirs, not just the committed one: a crashed
    // build leaves an unreferenced partial tree whose number must not
    // be reused
    val next = (listGens(spark, dir) :+ cur.getOrElse(0L)).max + 1L
    val newRoot = s"$dir/$genPrefix$next"
    val d = new Path(dir)
    val fs = fsOf(spark, d)
    fs.delete(new Path(newRoot), true)
    build(newRoot)
    // commit: write aside, atomic rename over the pointer
    val tmp = new Path(s"$dir/$pointerName.tmp")
    val ptr = new Path(s"$dir/$pointerName")
    writeProps(spark, tmp.toString, Seq("gen" -> next.toString))
    if (!fs.rename(tmp, ptr)) {
      // portability fallback (HDFS rename refuses an existing dest):
      // delete-then-rename, with resolveRoot's legacy fallback only
      // exposed for the instant between the two calls
      fs.delete(ptr, false)
      require(fs.rename(tmp, ptr), s"pointer commit failed for $dir")
    }
    // cleanup: keep the new generation plus (per retention conf) the
    // newest N previously COMMITTED ones — everything else goes,
    // including any stale partial from a crashed build (whose number
    // may sit ABOVE the committed generation, so a numeric floor would
    // wrongly prefer it over the live previous gens). Only gens <= the
    // just-superseded committed one count as real history.
    val n = keepGenerations(spark)
    val prevKept = listGens(spark, dir)
      .filter(g => cur.exists(g <= _)).sorted.reverse.take(n)
    val keep: Set[Long] = Set(next) ++ prevKept
    listGens(spark, dir).filterNot(keep)
      .foreach(g => fs.delete(new Path(s"$dir/$genPrefix$g"), true))
    // the legacy root-level entries are the OLDEST snapshot: delete
    // them only once the retention window holds n REAL generations
    // (n=0 deletes at the first commit, matching no-retention mode).
    // While retained they carry a marker so resolveRoot never mistakes
    // them for live data if the pointer goes missing.
    if (prevKept.size >= n) {
      fs.listStatus(d).map(_.getPath).foreach { p =>
        if (legacyEntry(p.getName)) fs.delete(p, true)
      }
      fs.delete(new Path(s"$dir/$legacyRetainedName"), false)
    } else if (cur.isEmpty &&
        fs.listStatus(d).exists(s => legacyEntry(s.getPath.getName)))
      writeProps(spark, s"$dir/$legacyRetainedName", Seq("gen" -> "legacy"))
    next
  }

  /** Heal the crash states the PRE-generation compaction code could
    * leave behind (two directory renames with the live path briefly
    * absent): live missing + complete build at `<dir>.compacting` →
    * finish the swap forward; live missing + history parked at
    * `<dir>.precompact` → roll it back; live present + leftovers →
    * drop them. Without this, the next append would mistake the empty
    * live path for index CREATION and silently orphan all history.
    * Idempotent and cheap (two stats when healthy) — every index entry
    * point calls it first.
    */
  def recoverLegacySwap(spark: SparkSession, dir: String): Unit = {
    val live = new Path(dir)
    val fs = fsOf(spark, live)
    val pre = new Path(s"$dir.precompact")
    val tmp = new Path(s"$dir.compacting")
    if (!fs.exists(pre)) return
    if (fs.exists(live)) {
      // swap completed; the park + any stale build are leftovers
      fs.delete(pre, true)
      fs.delete(tmp, true)
    } else if (fs.exists(tmp)) {
      // crashed between the two renames: the build was complete (the
      // first rename only ran after it), so finish forward
      require(fs.rename(tmp, live), s"recovery rename $tmp -> $dir failed")
      fs.delete(pre, true)
    } else {
      // build gone too — roll history back
      require(fs.rename(pre, live), s"recovery rename $pre -> $dir failed")
    }
  }
}
