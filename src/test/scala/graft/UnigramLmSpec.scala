package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Pins the unigram-LM tokenizer contract: Viterbi segmentation is
  * max-likelihood and total (char fallback), training is deterministic
  * and coverage-complete, and the registered queries' composition
  * holds (fertility >= 1, concatenation identity).
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("viterbi picks the max-likelihood split and falls back to chars") {
    val lp = Map("ab" -> math.log(0.5), "a" -> math.log(0.25),
      "b" -> math.log(0.25))
    assert(UnigramLm.viterbi("abab", lp, 6) == Seq("ab", "ab"))
    assert(UnigramLm.viterbi("aba", lp, 6) == Seq("ab", "a"))
    // chars absent from the vocab: per-char fallback keeps coverage
    assert(UnigramLm.viterbi("xy", lp, 6) == Seq("x", "y"))
    // a longer piece must win over char chains when more probable
    val lp2 = Map("abc" -> math.log(0.9), "a" -> math.log(0.01),
      "b" -> math.log(0.01), "c" -> math.log(0.01))
    assert(UnigramLm.viterbi("abcabc", lp2, 6) == Seq("abc", "abc"))
  }

  test("training: coverage, frequent substrings surface, deterministic") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "lower newest lowest newer low new " +
        (if (i % 2 == 0) "sharing shared shares" else "walked walking walks")))
      .toDF("doc_id", "text")
    val (vocab, _) = UnigramLm.train(docs, "text", targetVocab = 64,
      maxPieceLen = 5, emIters = 2, maxCandidates = 256)
    val pieces = vocab.map(_._1).toSet
    // every character of the corpus is a piece (coverage floor)
    val chars = "lowernewstsharingdwalk".map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(vocab.size <= 64)
    // high-frequency substrings must emerge as multi-char pieces
    assert(pieces.exists(p => p.length >= 3),
      s"no multi-char piece learned: $pieces")
    // deterministic end to end
    val (again, _) = UnigramLm.train(docs, "text", targetVocab = 64,
      maxPieceLen = 5, emIters = 2, maxCandidates = 256)
    assert(vocab == again)
    // segmentation under the trained vocab concatenates back
    val lp = vocab.map(v => (v._1, v._3)).toMap
    for (w <- Seq("lower", "newest", "sharing", "walked", "unseenword"))
      assert(UnigramLm.viterbi(w, lp, 5).mkString == w)
  }

  test("driver and distributed trainers produce identical vocabularies") {
    // driverGate = 0 forces every word table over the gate, exercising
    // the distributed seeding + EM passes that the 2M-word gate
    // otherwise hides from tests; both paths share viterbi and integer
    // count arithmetic, so equality is exact (incl. the log-probs)
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, "lower newest lowest newer low new wider widest"))
      .toDF("doc_id", "text")
    val (a, _) = UnigramLm.trainGated(docs, "text", targetVocab = 48,
      maxPieceLen = 5, emIters = 2, maxCandidates = 128,
      driverGate = Long.MaxValue)
    val (b, _) = UnigramLm.trainGated(docs, "text", targetVocab = 48,
      maxPieceLen = 5, emIters = 2, maxCandidates = 128, driverGate = 0L)
    assert(a == b, s"driver=${a.take(8)} distributed=${b.take(8)}")
  }

  test("viterbi walks codepoint boundaries (supplementary chars)") {
    // emoji are one codepoint / two UTF-16 units. The corpus tokenizer
    // (TextOps.clean) strips non-ASCII, so training words are BMP-only
    // — but segment()/viterbi accept arbitrary words at APPLY time,
    // and their piece lengths must count codepoints like Spark's
    // substring/length (the unit the distributed seeding uses).
    // maxPieceLen=1 in UTF-16 units could never hold an emoji; in
    // codepoints it must.
    val lp = Map("😀" -> math.log(0.5), "z" -> math.log(0.5))
    assert(UnigramLm.viterbi("z😀z", lp, 1) == Seq("z", "😀", "z"))
    // per-codepoint fallback never splits a surrogate pair
    val segs = UnigramLm.viterbi("a🚀b", Map("q" -> 0.0), 4)
    assert(segs == Seq("a", "🚀", "b"), segs.toString)
    assert(segs.mkString == "a🚀b")
    // cpOffsets: boundaries land on codepoint starts only
    assert(UnigramLm.cpOffsets("a😀b").toSeq == Seq(0, 1, 3, 4))
  }

  test("encode profile: fertility bounded below by 1, counts consistent") {
    val prof = graft.queries.TextQueries.ulmEncode(spark, sfDir)
    val bad = prof.where(col("n_subwords") < col("n_words")).count()
    assert(bad == 0, "every word yields at least one piece")
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(graft.text.TextOps.tokens(col("text")))
        .cast("long").as("n_tokens"))
    val joined = prof.join(toks, "doc_id")
      .where(col("n_words") =!= col("n_tokens")).count()
    assert(joined == 0, "profile word counts must match the token counts query")
  }
}
