package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training + encoding — the third
  * subword family next to [[Bpe]] and [[UnigramLm]] (public algorithm:
  * Schuster & Nakajima 2012, "Japanese and Korean voice search"; the
  * BERT tokenizer). Two public differences from BPE, both implemented:
  *
  *  - TRAINING picks the merge maximizing the likelihood ratio
  *    count(ab) / (count(a) * count(b)) — "merge the pair whose fusion
  *    most increases corpus likelihood under a unigram model" — not
  *    the raw pair count. Symbol counts are corpus-weighted occurrence
  *    totals under the current segmentation.
  *  - ENCODING is greedy longest-match-first against the final vocab,
  *    with non-initial pieces carrying the `##` continuation prefix;
  *    a word with no valid segmentation becomes `[UNK]`.
  *
  * Scale shape mirrors [[Bpe]]: everything trains on the Zipf-bounded
  * word-frequency table (corpus scanned ONCE into (word, cnt)); under
  * the [[Bpe.driverTrainMaxWords]] gate the merge loop runs in-memory
  * on the driver (the regime every production WordPiece trainer
  * operates in), above it each round is one pair+symbol aggregation
  * job over the vocabulary table. Encoding joins word EVENTS against
  * the segmented TYPE table — the corpus is never re-folded through
  * the merge stack.
  *
  * Determinism (golden-hash requirement): the likelihood ratio is
  * compared on exact cross-multiplied Longs — score(ab) > score(cd)
  * iff count(ab)*count(c)*count(d) > count(cd)*count(a)*count(b), as
  * BigInt to dodge overflow — so there is NO float tie ambiguity; ties
  * break lexicographically on (a, b).
  */
object WordPiece {

  /** Continuation prefix for non-initial subword pieces. */
  val Cont = "##"

  /** Unknown-word token emitted when encoding fails. */
  val Unk = "[UNK]"

  /** Trained model: ordered merge list and the final piece vocabulary
    * (surface forms: word-initial pieces bare, continuations with ##).
    */
  final case class Model(merges: Seq[(String, String)], vocab: Set[String])

  /** Trains `nMerges` likelihood-ratio merges over the corpus' word
    * frequency table; returns the model plus the final segmented
    * word-type table (word, cnt, syms) with ##-prefixed continuation
    * symbols — the artifact encode profiles join against.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int)
      : (Model, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    if (words.count() <= Bpe.driverTrainMaxWords) {
      val rows = words.select(col("word"), col("cnt")).as[(String, Long)]
        .collect()
      trainInMemory(spark, rows, nMerges)
    } else trainDistributed(words, nMerges)
  }

  /** In-word symbol arrays with the ## continuation convention applied
    * from the start (the published trainer works in this space, so a
    * merged `##a##b` piece is distinct from a word-initial `a##b`).
    */
  private def initialSyms(word: String): Array[String] =
    word.split("").zipWithIndex
      .map { case (c, i) => if (i == 0) c else Cont + c }

  private def stripCont(s: String): String =
    if (s.startsWith(Cont)) s.substring(Cont.length) else s

  /** Merge winner selection on exact integer arithmetic: maximize
    * count(ab)/(count(a)*count(b)), ties on (a, b) ascending. Pairs
    * must occur at least twice (the [[Bpe]] exhaustion contract).
    */
  private def pickBest(pairCnt: collection.Map[(String, String), Long],
      symCnt: collection.Map[String, Long])
      : Option[(String, String)] = {
    var best: ((String, String), Long, BigInt, BigInt) = null
    // score = pc / (sa * sb); compare pc1 * d2 vs pc2 * d1 exactly
    pairCnt.iterator.filter(_._2 >= 2L).foreach { case (p, pc) =>
      val den = BigInt(symCnt(p._1)) * BigInt(symCnt(p._2))
      if (best == null) best = (p, pc, BigInt(pc), den)
      else {
        val cmp = (BigInt(pc) * best._4).compare(best._3 * den)
        val better = cmp > 0 || (cmp == 0 && {
          val ca = p._1.compareTo(best._1._1)
          ca < 0 || (ca == 0 && p._2.compareTo(best._1._2) < 0)
        })
        if (better) best = (p, pc, BigInt(pc), den)
      }
    }
    Option(best).map(_._1)
  }

  private[graft] def trainInMemory(spark: SparkSession,
      rows: Array[(String, Long)], nMerges: Int): (Model, DataFrame) = {
    val cnts = rows.map(_._2)
    var syms: Array[Array[String]] = rows.map(r => initialSyms(r._1))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val pairCnt = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j < s.length) {
          symCnt(s(j)) = symCnt.getOrElse(s(j), 0L) + cnts(i)
          if (j < s.length - 1) {
            val k = (s(j), s(j + 1))
            pairCnt(k) = pairCnt.getOrElse(k, 0L) + cnts(i)
          }
          j += 1
        }
        i += 1
      }
      pickBest(pairCnt, symCnt) match {
        case None => exhausted = true
        case Some((a, b)) =>
          merges += ((a, b))
          val ab = a + stripCont(b)
          syms = syms.map { s =>
            if (s.length < 2) s
            else {
              val out =
                new scala.collection.mutable.ArrayBuffer[String](s.length)
              var j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
                  out += ab; j += 2
                } else { out += s(j); j += 1 }
              }
              out.toArray
            }
          }
      }
    }
    import spark.implicits._
    val table = rows.indices
      .map(i => (rows(i)._1, cnts(i), syms(i).toSeq))
      .toDF("word", "cnt", "syms")
    // the standard WordPiece vocabulary: alphabet (all initial char
    // pieces) + ONE token per merge — intermediate merge products stay
    // in the vocab so greedy longest-match can use them
    val vocab = rows.iterator.flatMap(r => initialSyms(r._1)).toSet ++
      merges.iterator.map { case (a, b) => a + stripCont(b) }
    (Model(merges.toSeq, vocab), table)
  }

  /** Distributed merge round (the over-gate path): one aggregation for
    * corpus-weighted pair counts, one for symbol counts, winner picked
    * from the joined score — same exact-integer comparison, expressed
    * as the cross-multiplied BigInt on the collected top slice. The
    * float score only BOUNDS the candidate set (top-4096 by double
    * score — float-vs-exact rank disagreement is confined to ~ulp
    * boundary neighbors, so the overfetch is astronomically safe);
    * the WINNER always comes from the exact integer re-rank.
    */
  private[graft] def trainDistributed(words0: DataFrame, nMerges: Int)
      : (Model, DataFrame) = {
    var words = words0
      .withColumn("syms", wordpieceInitCol(col("word")))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var pendingLayers = 0
    while (merges.length < nMerges && !exhausted) {
      val ex = words.select(col("cnt"), col("syms"))
      val symCnt = ex.select(col("cnt"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("cnt").as("sc"))
      val pairCnt = ex
        .select(col("cnt"), explode(
          when(size(col("syms")) < 2,
            array().cast("array<struct<a:string,b:string>>"))
            .otherwise(zip_with(
              slice(col("syms"), lit(1), size(col("syms")) - 1),
              slice(col("syms"), lit(2), size(col("syms")) - 1),
              (x, y) => struct(x.as("a"), y.as("b"))))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("pc"))
        .where(col("pc") >= 2)
      val top = pairCnt
        .join(symCnt.withColumnRenamed("s", "a")
          .withColumnRenamed("sc", "sa"), "a")
        .join(symCnt.withColumnRenamed("s", "b")
          .withColumnRenamed("sc", "sb"), "b")
        .select("a", "b", "pc", "sa", "sb")
        .orderBy((col("pc").cast("double") /
          (col("sa").cast("double") * col("sb").cast("double"))).desc,
          col("a"), col("b"))
        .limit(4096)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        // exact re-rank of the overfetched slice (float order is only
        // used to BOUND the candidate set, never to pick the winner)
        val exact = top.map { r =>
          ((r.getString(0), r.getString(1)), r.getLong(2),
            BigInt(r.getLong(2)), BigInt(r.getLong(3)) * BigInt(r.getLong(4)))
        }
        val w = exact.reduceLeft { (x, y) =>
          val cmp = (y._3 * x._4).compare(x._3 * y._4)
          if (cmp > 0 || (cmp == 0 && {
            val ca = y._1._1.compareTo(x._1._1)
            ca < 0 || (ca == 0 && y._1._2.compareTo(x._1._2) < 0)
          })) y
          else x
        }
        val (a, b) = w._1
        merges += ((a, b))
        val ab = a + stripCont(b)
        words = words.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) =>
              when(size(acc) > 0 &&
                  element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(lit(ab))))
                .otherwise(concat(acc, array(x)))))
        pendingLayers += 1
        if (pendingLayers == 4) {
          words = words.localCheckpoint(true)
          pendingLayers = 0
        }
      }
    }
    if (pendingLayers > 0) words = words.localCheckpoint(true)
    val spark = words.sparkSession
    import spark.implicits._
    // alphabet + one token per merge (same contract as the in-memory
    // path; the alphabet is vocabulary-table-bounded, one distinct job)
    val vocab = words.select(explode(wordpieceInitCol(col("word"))).as("s"))
        .distinct().as[String].collect().toSet ++
      merges.iterator.map { case (a, b) => a + stripCont(b) }
    (Model(merges.toSeq, vocab), words)
  }

  /** Column form of [[initialSyms]]. */
  private def wordpieceInitCol(word: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    zip_with(split(word, ""),
      sequence(lit(0), length(word) - 1),
      (c, i) => when(i === 0, c).otherwise(concat(lit(Cont), c)))

  /** BERT greedy longest-match-first segmentation of one word against
    * a piece vocabulary; None = unsegmentable ([UNK]).
    */
  private[graft] def matchWord(word: String, vocab: Set[String])
      : Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val piece0 = word.substring(start, end)
        val piece = if (start == 0) piece0 else Cont + piece0
        if (vocab.contains(piece)) found = piece else end -= 1
      }
      if (found == null) return None
      out += found
      start = end
    }
    Some(out.toSeq)
  }

  /** Per-document encoding profile under a trained model: word count,
    * subword count, OOV word count, fertility over in-vocab words.
    * Word EVENTS left-join the segmented TYPE table ([[train]]'s second
    * return) — one tokenize pass, one vocabulary-sized join. Word types
    * NOT in the training corpus (null from the left join) are segmented
    * on the fly by the same greedy matcher (`coalesce` evaluates the
    * UDF only for those rows), so encoding an out-of-corpus document
    * counts every word: in-vocab unseen words get real fertility and
    * only truly unsegmentable words count as OOV.
    */
  def encodeProfile(docs: DataFrame, idCol: String, textCol: String,
      model: Model, types: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model.vocab)
    val segLen = udf((w: String) =>
      matchWord(w, bc.value).map(_.length.toLong).getOrElse(-1L))
    val lens = types.select(col("word"), segLen(col("word")).as("_ns"))
    docs.select(col(idCol),
        explode(graft.text.TextOps.tokens(col(textCol))).as("word"))
      .join(lens, Seq("word"), "left")
      .withColumn("_ns", coalesce(col("_ns"), segLen(col("word"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("_ns") === -1L, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("_ns") === -1L, 1L).otherwise(col("_ns")))
          .as("n_subwords"),
        round(avg(when(col("_ns") =!= -1L, col("_ns"))), 4)
          .as("fertility"))
      .orderBy(idCol)
  }

  /** Vocabulary profile: corpus-weighted occurrence totals of the
    * final segmentation's pieces, top `topK` by (count desc, piece).
    */
  def vocabProfile(types: DataFrame, topK: Int): DataFrame =
    types
      .select(col("cnt"), explode(col("syms")).as("piece"))
      .groupBy("piece")
      .agg(sum("cnt").as("n_occurrences"),
        count(lit(1)).as("n_distinct_words"))
      .orderBy(col("n_occurrences").desc, col("piece"))
      .limit(topK)
}
