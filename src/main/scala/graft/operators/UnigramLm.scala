package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM subword tokenizer training — the second
  * major subword family next to [[Bpe]] (public algorithm: Kudo 2018,
  * "Subword Regularization", the SentencePiece unigram model).
  * Simplifications vs the paper, both documented and pinned: hard-EM
  * (Viterbi-best segmentation instead of lattice forward-backward
  * expectations) and frequency-top-K candidate seeding (instead of the
  * suffix-array enumeration) — the standard cheap variant; vocab
  * quality differs from SentencePiece's but the contract (probabilistic
  * piece vocab + max-likelihood segmentation) is the same.
  *
  * Scale shape (mirrors [[Bpe]] — the part that matters at 100 TB):
  * everything trains on the WORD-TYPE table (corpus scanned once into
  * Zipf-bounded (word, cnt)); candidate seeding is one substring
  * explode over word types (≤ len·maxPieceLen rows per type) + one
  * top-K; each EM iteration is ONE distributed pass — Viterbi per word
  * type against the BROADCAST current vocab (bounded by maxCandidates,
  * ~100 B/piece), piece counts re-aggregated corpus-weighted. Driver
  * state is the vocabulary being trained, never corpus-sized — the
  * same bargain as IVF/PQ codebooks.
  *
  * Determinism (golden-hash requirement): candidate and prune ties
  * break on (count desc, piece); Viterbi ties keep the EARLIEST start
  * (longest final piece); all float work is driver-free except
  * Math.log on exact long counts — run-to-run and partition-layout
  * independent.
  */
object UnigramLm {

  /** UTF-16 offset of each CODEPOINT boundary in `w` (length = number
    * of codepoints + 1). All piece enumeration and DP below walks these
    * boundaries, so piece lengths count codepoints — matching Spark's
    * `substring`/`length` semantics used by the distributed seeding
    * pass. Words with supplementary characters (emoji, rare CJK)
    * therefore segment identically on the driver and distributed paths.
    */
  private[graft] def cpOffsets(w: String): Array[Int] = {
    val buf = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < w.length) {
      i += Character.charCount(w.codePointAt(i))
      buf += i
    }
    buf.toArray
  }

  /** Viterbi max-likelihood segmentation of one word under piece
    * log-probs. Words containing a character absent from the vocab
    * fall back to per-codepoint pieces (coverage guarantee at apply
    * time; cannot happen for training words, whose chars are all
    * seeded).
    */
  private[graft] def viterbi(word: String, lp: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val offs = cpOffsets(word)
    val n = offs.length - 1
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val p = lp.getOrElse(word.substring(offs(j), offs(i)),
          Double.NegativeInfinity)
        if (p != Double.NegativeInfinity && best(j) + p > best(i)) {
          best(i) = best(j) + p
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity)
      (0 until n).map(k => word.substring(offs(k), offs(k + 1)))
    else {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var k = n
      while (k > 0) {
        out.prepend(word.substring(offs(back(k)), offs(k)))
        k = back(k)
      }
      out.toSeq
    }
  }

  /** Trained vocabulary: (piece, n_uses, logprob), n_uses = corpus-
    * weighted Viterbi occurrence count under the final model. Also
    * returns the checkpointed word-TYPE table (word, cnt) so callers
    * profiling the tokenizer don't re-derive types from the corpus.
    */
  def train(docs: DataFrame, textCol: String, targetVocab: Int,
      maxPieceLen: Int = 6, emIters: Int = 3,
      maxCandidates: Int = 4096): (Seq[(String, Long, Double)], DataFrame) =
    trainGated(docs, textCol, targetVocab, maxPieceLen, emIters,
      maxCandidates, Bpe.driverTrainMaxWords)

  /** [[train]] with the driver fast-path gate exposed — the parity-test
    * seam (`driverGate = 0` forces the distributed EM loop on a corpus
    * of any size; the spec asserts both paths produce identical
    * vocabularies).
    */
  private[graft] def trainGated(docs: DataFrame, textCol: String,
      targetVocab: Int, maxPieceLen: Int, emIters: Int,
      maxCandidates: Int, driverGate: Long)
      : (Seq[(String, Long, Double)], DataFrame) = {
    val spark = docs.sparkSession
    val words = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    // Driver fast path, same gate + rationale as [[Bpe.trainOnDriver]]:
    // the whole EM loop runs over the Zipf-bounded word-TYPE table, so
    // when that fits in memory the corpus scan stays distributed and
    // the per-iteration jobs (substring seeding + one Viterbi recount
    // per EM round, 5 jobs total) collapse into in-memory loops over
    // the SAME `viterbi` and the same integer count arithmetic —
    // results are identical, not approximately equal. Past the gate the
    // distributed passes below remain the 100 TB path.
    val wordArr: Array[(String, Long)] =
      if (words.count() <= driverGate) {
        import spark.implicits._
        words.select(col("word"), col("cnt")).as[(String, Long)].collect()
      } else null

    // candidate seeding: corpus-frequency top-K substrings + ALL single
    // chars (coverage floor). Substring explode is bounded per word
    // type; the top-K is one TakeOrdered. The driver loop walks
    // CODEPOINT boundaries ([[cpOffsets]]) so its substrings and piece
    // lengths match the distributed branch's Spark substring/length
    // (codepoint) semantics exactly.
    val seeded: Array[(String, Long)] =
      if (wordArr != null) {
        val totals = scala.collection.mutable.HashMap.empty[String, Long]
        wordArr.foreach { case (w, cnt) =>
          val offs = cpOffsets(w)
          val n = offs.length - 1
          var i = 0
          while (i < n) {
            var l = 1
            val maxL = math.min(maxPieceLen, n - i)
            while (l <= maxL) {
              val p = w.substring(offs(i), offs(i + l))
              totals(p) = totals.getOrElse(p, 0L) + cnt
              l += 1
            }
            i += 1
          }
        }
        val chars = totals.iterator.filter(t => cpLen(t._1) == 1).toArray
        val top = totals.iterator.filter(t => cpLen(t._1) > 1).toArray
          .sortBy { case (p, n) => (-n, p) }.take(maxCandidates)
        chars ++ top
      } else {
        val subs = words
          .select(col("cnt"), col("word"),
            explode(sequence(lit(1), length(col("word")))).as("i"))
          .select(col("cnt"), col("word"), col("i"),
            explode(sequence(lit(1), least(lit(maxPieceLen),
              length(col("word")) - col("i") + 1))).as("l"))
          .select(expr("substring(word, i, l)").as("piece"), col("cnt"))
          .groupBy("piece").agg(sum("cnt").as("n"))
        val chars = subs.where(length(col("piece")) === 1)
        val top = subs.where(length(col("piece")) > 1)
          .orderBy(col("n").desc, col("piece")).limit(maxCandidates)
        chars.unionByName(top)
          .collect().map(r => (r.getString(0), r.getLong(1)))
      }

    var counts: Map[String, Long] = seeded.toMap
    var vocabLp: Map[String, Double] = normalize(counts)

    def uses(lp: Map[String, Double]): Map[String, Long] =
      if (wordArr != null) {
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        wordArr.foreach { case (w, cnt) =>
          viterbi(w, lp, maxPieceLen).foreach { p =>
            acc(p) = acc.getOrElse(p, 0L) + cnt
          }
        }
        acc.toMap
      } else countUses(spark, words, lp, maxPieceLen)

    // hard EM: segment word types under the broadcast model, recount
    // corpus-weighted, renormalize. Pieces that win no segmentation
    // drop out (chars keep a floor so coverage never breaks).
    for (_ <- 1 to emIters) {
      counts = uses(vocabLp)
      val floored = withCharFloor(counts, vocabLp)
      vocabLp = normalize(floored)
    }

    // prune to target: single chars always survive; multi-char pieces
    // by (uses desc, piece). Final counts under the pruned model.
    val charPieces = vocabLp.keySet.filter(cpLen(_) == 1)
    val kept = charPieces ++
      counts.filter { case (p, _) => cpLen(p) > 1 && vocabLp.contains(p) }
        .toSeq.sortBy { case (p, n) => (-n, p) }
        .take(math.max(0, targetVocab - charPieces.size)).map(_._1)
    vocabLp = normalize(withCharFloor(
      counts.filter { case (p, _) => kept.contains(p) },
      vocabLp.filter { case (p, _) => kept.contains(p) }))
    val finalCounts = uses(vocabLp)
    val vocab = kept.toSeq.sorted.map { p =>
      (p, finalCounts.getOrElse(p, 0L), vocabLp(p))
    }.sortBy { case (p, n, _) => (-n, p) }
    (vocab, words)
  }

  /** One distributed EM pass: corpus-weighted piece-use counts under
    * Viterbi segmentation against the broadcast model.
    */
  private def countUses(spark: SparkSession, words: DataFrame,
      lp: Map[String, Double], maxPieceLen: Int): Map[String, Long] = {
    val bc = spark.sparkContext.broadcast(lp)
    val seg = udf((w: String) => viterbi(w, bc.value, maxPieceLen))
    words.select(explode(seg(col("word"))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
  }

  /** Piece length in CODEPOINTS — the unit every single-char filter
    * uses, so a supplementary character (one codepoint, two UTF-16
    * units) is a "char" on both the driver and distributed paths.
    */
  private def cpLen(p: String): Int = p.codePointCount(0, p.length)

  private def withCharFloor(counts: Map[String, Long],
      prev: Map[String, Double]): Map[String, Long] =
    counts ++ prev.keysIterator
      .filter(p => cpLen(p) == 1 && !counts.contains(p))
      .map(_ -> 1L)

  private def normalize(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, n) => p -> math.log(n / total) }
  }

  /** Apply a trained vocab to a word column: max-likelihood pieces. */
  def segment(lp: Map[String, Double], maxPieceLen: Int = 6)
      : Column => Column = {
    val f = udf((w: String) => viterbi(w, lp, maxPieceLen))
    (c: Column) => f(c)
  }
}
