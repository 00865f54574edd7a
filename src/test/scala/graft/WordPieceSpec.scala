package graft

import graft.operators.WordPiece

/** Pins the WordPiece contract (Schuster & Nakajima 2012 / the BERT
  * tokenizer): likelihood-ratio merge selection (the differentiator
  * vs BPE's raw pair counts), ## continuation surface forms, greedy
  * longest-match-first encoding with [UNK] fallback, and in-memory /
  * distributed trainer parity.
  */
class WordPieceSpec extends SparkSpec {

  test("likelihood ratio picks a different merge than raw pair count") {
    // "ab" dominates by raw count (8), but its symbols are everywhere;
    // "xq" is rarer (3) with rare symbols, so pc/(sa*sb) favors it:
    //   (a,##b): 8/(12*8) = 1/12 ; (x,##q): 3/(3*3) = 1/3
    // -> xq wins under WordPiece, while BPE (raw count) would merge
    // (a, ##b) first.
    val rows = Array(
      ("ab", 8L), ("xq", 3L), ("a", 4L), ("b", 3L))
    val (model, _) = WordPiece.trainInMemory(spark, rows, 1)
    assert(model.merges == Seq(("x", "##q")))
  }

  test("continuation surface forms merge correctly") {
    // one word "abc" x4: symCnt a=4, ##b=4, ##c=4; pairs (a,##b)=4,
    // (##b,##c)=4 tie on score 4/16 -> lexicographic (##b,##c) first
    // (## sorts before plain letters); merged piece is "##bc", then
    // (a, ##bc) merges to "abc".
    val rows = Array(("abc", 4L))
    val (model, types) = WordPiece.trainInMemory(spark, rows, 2)
    assert(model.merges == Seq(("##b", "##c"), ("a", "##bc")))
    val syms = types.select("syms").collect()(0).getSeq[String](0)
    assert(syms == Seq("abc"))
    assert(model.vocab.contains("##bc") && model.vocab.contains("abc"))
  }

  test("greedy longest-match-first encoding + [UNK] fallback") {
    val vocab = Set("un", "##aff", "##able", "##ff", "a", "##b", "##l", "##e")
    // longest-first: un + ##aff + ##able (not un + ##a + ...)
    assert(WordPiece.matchWord("unaffable", vocab)
      .contains(Seq("un", "##aff", "##able")))
    // unseen char -> unsegmentable -> None ([UNK])
    assert(WordPiece.matchWord("unz", vocab).isEmpty)
    // single chars segment via char pieces
    assert(WordPiece.matchWord("ab", vocab).contains(Seq("a", "##b")))
  }

  test("in-memory and distributed trainers agree") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "a cat and a mat and a hat"),
      (4L, "hats and mats and cats"))
      .toDF("doc_id", "text")
    val words = graft.operators.Bpe.wordCounts(docs, "text")
      .localCheckpoint(true)
    val rows = words.select("word", "cnt").as[(String, Long)].collect()
    val (mMem, tMem) = WordPiece.trainInMemory(spark, rows, 8)
    val (mDist, tDist) = WordPiece.trainDistributed(words, 8)
    assert(mMem.merges == mDist.merges)
    assert(mMem.vocab == mDist.vocab)
    val a = tMem.select("word", "syms").collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toMap
    val b = tDist.select("word", "syms").collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(a == b)
  }

  test("property: segmentation is a partition of the word (200 random words)") {
    // any successful match must concatenate (continuations stripped)
    // back to the word, every piece must come from the vocab, and a
    // word over the training alphabet always segments (char floor)
    val docs = {
      import spark.implicits._
      Seq((1L, "abc bcd cab abca bcab")).toDF("doc_id", "text")
    }
    val (model, _) = WordPiece.train(docs, "text", 5)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => "abcd".charAt(rnd.nextInt(4))).mkString
      WordPiece.matchWord(w, model.vocab) match {
        case Some(ps) =>
          assert(ps.nonEmpty && ps.forall(model.vocab.contains))
          val rebuilt = ps.head + ps.tail.map(_.substring(2)).mkString
          assert(rebuilt == w, s"$w segmented to $ps")
          assert(ps.tail.forall(_.startsWith("##")))
          assert(!ps.head.startsWith("##"))
        case None =>
          // only possible if w contains a char outside the vocab
          assert(w.exists(c => !model.vocab.contains(c.toString)),
            s"$w failed to segment despite full char coverage")
      }
    }
  }

  test("encode profile counts out-of-corpus words instead of dropping them") {
    import spark.implicits._
    val train = Seq((1L, "aa ab aa ab"), (2L, "ba ba")).toDF("doc_id", "text")
    val (model, types) = WordPiece.train(train, "text", 2)
    // "aaba" never occurred as a word type but is segmentable from the
    // learned pieces; "zz" has chars outside the alphabet -> true OOV
    val unseen = Seq((9L, "aaba aa zz")).toDF("doc_id", "text")
    val out = WordPiece.encodeProfile(unseen, "doc_id", "text", model, types)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = out.find(_._1 == 9L).get
    assert(d._2 == 3L, s"all three words must be counted, got ${d._2}")
    assert(d._3 == 1L, s"only zz is OOV, got ${d._3}")
  }

  test("encode profile counts OOV words and in-vocab fertility") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab zz"), (2L, "aa aa")).toDF("doc_id", "text")
    val (model0, types) = WordPiece.train(docs, "text", 2)
    // force an OOV: drop every piece containing 'z' from the vocab
    val model = model0.copy(vocab = model0.vocab.filterNot(_.contains("z")))
    val out = WordPiece.encodeProfile(docs, "doc_id", "text", model, types)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d1 = out.find(_._1 == 1L).get
    assert(d1._2 == 3L) // three words
    assert(d1._3 == 1L) // zz is OOV
    val d2 = out.find(_._1 == 2L).get
    assert(d2._3 == 0L)
  }
}
