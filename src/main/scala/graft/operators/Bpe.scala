package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Distributed byte-pair-encoding tokenizer training — the missing
  * link between corpus prep and an actual LLM tokenizer (public
  * algorithm: Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units").
  *
  * Scale shape (the part that matters at 100 TB): BPE trains on the
  * WORD-FREQUENCY table, not the corpus — the corpus is scanned ONCE
  * into (word, count) (Zipf-bounded, ~10^7 rows for web-scale text, no
  * skew because it is already aggregated), and every merge round runs
  * over that vocabulary table only: one pair-count aggregation
  * (adjacent symbol pairs weighted by word count), one global top-1
  * (orderBy+limit(1) -> TakeOrdered, one row to the driver), one
  * symbol-array rewrite. Driver state = the merge list itself
  * (nMerges pairs — the artifact being trained). The vocabulary table
  * is localCheckpoint'ed each round so the plan stays flat instead of
  * stacking nMerges lambda layers.
  *
  * Determinism: ties on pair count break lexicographically on (first,
  * second) — run-to-run and cluster-layout independent, which the
  * golden-hash pin requires. No end-of-word marker is used (documented
  * simplification vs Sennrich's </w>; merges therefore never cross
  * word boundaries but suffix tokens are not distinguished from
  * mid-word ones).
  */
object Bpe {

  /** One corpus scan -> the (word, cnt) training table. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right merge of one (a, b) pair inside a symbol
    * array, as a fold — "aaa" under (a,a) becomes [aa, a], exactly the
    * non-overlapping semantics reference BPE uses.
    */
  private[graft] def mergePair(a: String, b: String)(syms: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent (a, b) symbol pairs of a word. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (x, y) => struct(x.as("a"), y.as("b"))))

  /** Trains `nMerges` merges; returns (merge list in order, final
    * vocabulary table (word, cnt, syms)). Stops early if no pair
    * occurs twice.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(String, String)], DataFrame) = {
    val (merges, snaps) = trainSnapshots(docs, textCol, Seq(nMerges))
    (merges, snaps(nMerges))
  }

  /** One greedy training run to `snapAt.max` merges, with the
    * vocabulary table snapshotted at every requested merge count.
    * Greedy BPE is PREFIX-DETERMINISTIC — the first k merges of a
    * longer run are exactly train(k)'s merges — so consumers wanting
    * different vocabulary sizes (the 20-merge encoder profile and the
    * 30-merge vocab profile) share ONE training loop instead of
    * re-running the per-round pair-count jobs from scratch. Returns
    * (full merge list, snapshot map); early exhaustion maps any larger
    * requested count to the final table (same as train's contract).
    */
  def trainSnapshots(docs: DataFrame, textCol: String, snapAt: Seq[Int])
      : (Seq[(String, String)], Map[Int, DataFrame]) =
    trainSnapshotsGated(docs, textCol, snapAt, driverTrainMaxWords)

  /** [[trainSnapshots]] with the driver fast-path gate exposed — the
    * parity-test seam (`driverGate = 0` forces the distributed merge
    * loop on a corpus of any size; the spec asserts both paths produce
    * identical merges and vocabulary tables).
    */
  private[graft] def trainSnapshotsGated(docs: DataFrame, textCol: String,
      snapAt: Seq[Int], driverGate: Long)
      : (Seq[(String, String)], Map[Int, DataFrame]) = {
    val nMerges = snapAt.max
    var words = wordCounts(docs, textCol)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    // Driver fast path (the Dedup union-find gate pattern): BPE trains
    // on the WORD-FREQUENCY table, which is Zipf-bounded — ~10^7 rows
    // for web-scale text — and every production tokenizer trainer
    // (Sennrich's reference impl included) runs the merge loop
    // in-memory over exactly this table. When it fits the gate, the
    // corpus-scan -> (word, cnt) aggregation stays distributed and only
    // the vocabulary-sized loop moves to the driver, replacing
    // nMerges x (pair-count job + top-1 job + periodic checkpoint)
    // with a single collect. Semantics are replicated exactly (integer
    // counts, (total desc, a, b) tie order, greedy non-overlap merge),
    // so goldens are bit-identical; beyond the gate the distributed
    // loop below remains the 100 TB path.
    if (words.count() <= driverGate)
      return trainOnDriver(words, nMerges, snapAt)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
    if (snapAt.contains(0)) snaps(0) = words
    var exhausted = false
    var pendingLayers = 0
    while (merges.length < nMerges && !exhausted) {
      val top = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("total"))
        .where(col("total") >= 2)
        .orderBy(col("total").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        words = words.withColumn("syms", mergePair(a, b)(col("syms")))
        // truncate the plan every few rounds: a handful of stacked fold
        // layers re-evaluate cheaply on the vocab table, but unbounded
        // stacking would blow analysis time (measured: per-round
        // checkpoints cost ~2x more wall clock than every-4th)
        pendingLayers += 1
        if (pendingLayers == 4 || snapAt.contains(merges.length)) {
          words = words.localCheckpoint(true)
          pendingLayers = 0
        }
        if (snapAt.contains(merges.length)) snaps(merges.length) = words
      }
    }
    if (pendingLayers > 0) words = words.localCheckpoint(true)
    snapAt.foreach(k => if (!snaps.contains(k)) snaps(k) = words)
    (merges.toSeq, snaps.toMap)
  }

  /** Gate for the in-memory training loop: word-frequency tables under
    * this row count collect to the driver (a few hundred MB at worst —
    * the scale HuggingFace/ SentencePiece trainers operate at); larger
    * vocabularies use the distributed per-round jobs.
    */
  private[graft] val driverTrainMaxWords = 2000000L

  /** The in-memory merge loop over a collected (word, cnt) table.
    * Exact replica of the distributed round: pair totals are
    * cnt-weighted adjacent-symbol counts, the winner is the
    * lexicographically-first (a, b) among the max totals >= 2, and the
    * merge rewrites each word greedily left-to-right without overlap.
    * All-integer arithmetic — no float divergence risk vs the
    * distributed path.
    */
  private def trainOnDriver(words: DataFrame, nMerges: Int,
      snapAt: Seq[Int]): (Seq[(String, String)], Map[Int, DataFrame]) = {
    val spark = words.sparkSession
    import spark.implicits._
    val rows = words.select(col("word"), col("cnt")).as[(String, Long)]
      .collect()
    val cnts = rows.map(_._2)
    var syms: Array[Array[String]] = rows.map(_._1.split(""))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
    def snapshot(): DataFrame = {
      val frozen = rows.indices.map(i =>
        (rows(i)._1, cnts(i), syms(i).toSeq))
      spark.createDataFrame(spark.sparkContext.parallelize(frozen, 1))
        .toDF("word", "cnt", "syms")
    }
    if (snapAt.contains(0)) snaps(0) = snapshot()
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val totals = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          totals(k) = totals.getOrElse(k, 0L) + cnts(i)
          j += 1
        }
        i += 1
      }
      val best = totals.iterator.filter(_._2 >= 2L).reduceOption { (x, y) =>
        // (total desc, a asc, b asc) — the distributed orderBy contract
        val c = java.lang.Long.compare(y._2, x._2)
        if (c < 0) x
        else if (c > 0) y
        else {
          val ca = x._1._1.compareTo(y._1._1)
          if (ca < 0) x
          else if (ca > 0) y
          else if (x._1._2.compareTo(y._1._2) <= 0) x else y
        }
      }
      best match {
        case None => exhausted = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          val ab = a + b
          syms = syms.map { s =>
            if (s.length < 2) s
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
              var j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
                  out += ab; j += 2
                } else { out += s(j); j += 1 }
              }
              out.toArray
            }
          }
          if (snapAt.contains(merges.length)) snaps(merges.length) = snapshot()
      }
    }
    snapAt.foreach(k => if (!snaps.contains(k)) snaps(k) = snapshot())
    (merges.toSeq, snaps.toMap)
  }

  /** Applies an already-trained merge list to a token column (array of
    * words -> array of subword tokens). Stacks one fold per merge —
    * fine for vocab-sized tables and specs; a production encoder for
    * raw-corpus throughput would bake the merge ranks into a native
    * expression instead (same preference order as the other graftx
    * ops).
    */
  def encode(merges: Seq[(String, String)])(word: Column): Column =
    merges.foldLeft(split(word, "")) { case (c, (a, b)) => mergePair(a, b)(c) }

  /** Tokenizer APPLICATION — per-document subword statistics under a
    * freshly trained vocabulary: word count, subword count, and
    * fertility (subwords per word, the standard tokenizer-quality
    * readout). Encodes TYPES, not events: [[train]]'s vocabulary table
    * already carries every distinct word's final symbols, so documents
    * just join their word events against a vocabulary-sized table —
    * the corpus is never re-folded through the merge stack.
    */
  def encodeProfile(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    val (merges, words) = train(docs, textCol, nMerges)
    encodeProfileFrom(docs, idCol, textCol, words, merges)
  }

  /** [[encodeProfile]] against an already-trained vocabulary table —
    * the [[trainSnapshots]] consumer path. The word-events left-join
    * the type table; word types NOT in the training corpus fall back
    * to the pure-column [[encode]] under the same merge list
    * (`coalesce` evaluates the fallback only for those rows), so
    * encoding an out-of-corpus document counts every word instead of
    * silently dropping unseen types from the profile.
    */
  def encodeProfileFrom(docs: DataFrame, idCol: String, textCol: String,
      words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val lens = words.select(col("word"),
      size(col("syms")).cast("long").as("_ns"))
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(lens, Seq("word"), "left")
      .withColumn("_ns", coalesce(col("_ns"),
        size(encode(merges)(col("word"))).cast("long")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("_ns").as("n_subwords"),
        round(avg("_ns"), 4).as("fertility"))
      .orderBy(idCol)
  }

  /** Subword-vocabulary profile after `nMerges` merges: corpus-weighted
    * token counts, top `topK` by (count desc, token) — the tokenizer
    * health readout (how much of the corpus mass the learned subwords
    * cover).
    */
  def vocabProfile(docs: DataFrame, textCol: String, nMerges: Int,
      topK: Int): DataFrame =
    vocabProfileFrom(train(docs, textCol, nMerges)._2, topK)

  /** [[vocabProfile]] against an already-trained vocabulary table. */
  def vocabProfileFrom(words: DataFrame, topK: Int): DataFrame =
    words
      .select(col("cnt"), explode(col("syms")).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("n_occurrences"),
        count(lit(1)).as("n_distinct_words"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)
}
