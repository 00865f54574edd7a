package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich (2016) toy corpus, as repeated-word documents
  private lazy val toy = Seq(
    ("low ", 5), ("lower ", 2), ("newest ", 6), ("widest ", 3))
    .flatMap { case (w, n) => Seq.fill(n)(w.trim) }
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("merge order on the Sennrich toy corpus") {
    val (merges, _) = Bpe.train(toy, "text", nMerges = 4)
    // es: 6+3=9; est: 9; then (l,o) and (o,w) tie at 7 ->
    // lexicographic tie-break picks (l,o), then (lo,w)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      merges.toString)
  }

  test("greedy left-to-right merge is non-overlapping") {
    val df = Seq(Seq("a", "a", "a", "a", "a")).toDF("syms")
      .select(Bpe.mergePair("a", "a")(col("syms")).as("m"))
    assert(df.collect()(0).getSeq[String](0) == Seq("aa", "aa", "a"))
  }

  test("encode applies trained merges to unseen words") {
    val (merges, _) = Bpe.train(toy, "text", nMerges = 4)
    val out = Seq("lowest").toDF("w")
      .select(Bpe.encode(merges)(col("w")).as("t"))
      .collect()(0).getSeq[String](0)
    // l-o-w-e-s-t: es, then est, then lo, then low
    assert(out == Seq("low", "est"), out.toString)
  }

  test("encodeProfile: per-doc subword counts and fertility, types-joined") {
    // doc 0: "abab abab" -> (a,b) merges (cnt 4), then (ab,ab) (cnt 2):
    // each "abab" is ONE symbol -> 2 words, 2 subwords, fertility 1.
    // doc 1: "cd" -> pair (c,d) occurs once (< 2), never merged ->
    // 1 word, 2 subwords, fertility 2.
    val docs = Seq((0L, "abab abab"), (1L, "cd")).toDF("doc_id", "text")
    val out = Bpe.encodeProfile(docs, "doc_id", "text", nMerges = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 2.0)))
  }

  test("driver and distributed merge loops agree exactly") {
    // driverGate = 0 forces the distributed per-round pair-count jobs
    // that the 2M-word gate otherwise hides from tests; merge order,
    // tie-breaks and final symbol tables must be identical
    val (mA, sA) = Bpe.trainSnapshotsGated(toy, "text", Seq(3, 6),
      driverGate = Long.MaxValue)
    val (mB, sB) = Bpe.trainSnapshotsGated(toy, "text", Seq(3, 6),
      driverGate = 0L)
    assert(mA == mB, s"driver=$mA distributed=$mB")
    for (k <- Seq(3, 6)) {
      val a = sA(k).select("word", "cnt", "syms")
        .as[(String, Long, Seq[String])].collect().toSet
      val b = sB(k).select("word", "cnt", "syms")
        .as[(String, Long, Seq[String])].collect().toSet
      assert(a == b, s"snapshot $k diverged")
    }
  }

  test("encodeProfileFrom counts words outside the training corpus") {
    // train on ab-heavy docs, then encode a DIFFERENT document whose
    // word "ababab" never appeared: the left join misses the type
    // table and the column-encode fallback segments it under the same
    // merges (ab+ab+ab after (a,b),(ab,ab) -> [abab, ab] = 2 subwords)
    val train = Seq((0L, "abab abab"), (1L, "cd")).toDF("doc_id", "text")
    val (merges, words) = Bpe.train(train, "text", nMerges = 5)
    val unseen = Seq((9L, "ababab abab")).toDF("doc_id", "text")
    val out = Bpe.encodeProfileFrom(unseen, "doc_id", "text", words, merges)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // 2 words (both counted — nothing dropped); abab=1 subword,
    // ababab=[abab,ab]=2 subwords
    assert(out === Seq((9L, 2L, 3L, 1.5)))
  }

  test("training conserves corpus mass and stops when exhausted") {
    val (merges, words) = Bpe.train(toy, "text", nMerges = 1000)
    // every merge must still cover the full corpus token mass
    val mass = words.select(
      sum(col("cnt") * size(col("syms")))).collect()(0).getLong(0)
    assert(mass > 0)
    // the toy corpus has < 1000 mergeable pairs: training must stop
    assert(merges.length < 1000, s"ran ${merges.length} merges")
    // fully-merged frequent words collapse to single symbols
    val lowSyms = words.where(col("word") === "low")
      .select("syms").collect()(0).getSeq[String](0)
    assert(lowSyms == Seq("low"))
  }

  test("vocab profile on the real corpus is deterministic") {
    val a = Bpe.vocabProfile(Tables(spark, sfDir, "documents"), "text",
      nMerges = 10, topK = 15).collect().toSeq
    val b = Bpe.vocabProfile(Tables(spark, sfDir, "documents"), "text",
      nMerges = 10, topK = 15).collect().toSeq
    assert(a == b, "training must be run-to-run deterministic")
    assert(a.nonEmpty)
  }
}
