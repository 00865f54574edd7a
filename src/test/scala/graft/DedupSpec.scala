package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Agreement tests for the hash-based dedup operators (which have no
  * DuckDB oracle): MinHash-LSH results must agree with exact blocking
  * Jaccard at the same threshold on the planted near-dups, and SimHash
  * band blocking must be complete within its Hamming guarantee.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("minhash-lsh finds every strong near-dup pair (jaccard >= 0.8)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    assert(exact.subsetOf(lsh),
      s"LSH missed strong pairs: ${exact -- lsh}")
  }

  test("shuffled verify join (no broadcast hint) is result-identical") {
    val hinted = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2,
        verifyBroadcast = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shuffled = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2,
        verifyBroadcast = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hinted.nonEmpty && hinted === shuffled && hinted === auto)
  }

  test("verify-broadcast auto-gate follows the size budget") {
    val sh = Dedup.shingled(docs, "doc_id", "text")
    assert(Dedup.shingleBroadcastFits(sh),
      "a test-corpus shingle table must fit the default 256 MB budget")
    spark.conf.set("spark.graft.dedup.broadcastBudget", "1")
    try assert(!Dedup.shingleBroadcastFits(sh),
      "a 1-byte budget must refuse the broadcast (the 100 TB posture)")
    finally spark.conf.unset("spark.graft.dedup.broadcastBudget")
  }

  test("minhash-lsh reported jaccard values are exact (match blocking verify)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j), s"jaccard mismatch for $pair")
    }
  }

  test("fuzzy join resolves truncated probes back to their source docs") {
    val out = graft.queries.DedupQueries.fuzzyNames(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probeIds = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(probeIds.nonEmpty)
    val selfResolved = probeIds.count(p => out.contains((p, p)))
    assert(selfResolved.toDouble / probeIds.length >= 0.8,
      s"only $selfResolved/${probeIds.length} probes resolved to source")
  }

  test("simhash band blocking is complete for hamming <= 3") {
    // every pair the operator reports is within the bound, and any pair
    // within hamming 3 must share one of the 4 16-bit bands (pigeonhole)
    val sig = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reported = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    reported.foreach { case ((a, b), h) =>
      assert(java.lang.Long.bitCount(sig(a) ^ sig(b)) == h && h <= 3)
    }
    val ids = sig.keys.toSeq.sorted
    val expected = for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(sig(i) ^ sig(j)) <= 3
    } yield (i, j)
    assert(expected.toSet == reported.keySet,
      s"band blocking disagreement: missing=${expected.toSet -- reported.keySet}")
  }

  test("decontamination flags self-overlap and clean+flagged partition the corpus") {
    import graft.operators.Decontaminate
    // benchmark = a slice of the corpus itself, PLUS the corpus keeps
    // those very docs: every kept bench twin must be flagged (a doc
    // trivially shares all shingles with itself)
    val bench = docs.where(col("doc_id") < 20)
    val corpus = docs // includes the bench docs verbatim
    val flagged = Decontaminate.flag(corpus, bench, "doc_id", "text",
      minShared = 5)
    val flaggedIds = flagged.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val benchWithShingles = Dedup.shingled(bench, "doc_id", "text")
      .where(size(col("shs")) >= 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchWithShingles.subsetOf(flaggedIds),
      s"missing self-hits: ${benchWithShingles -- flaggedIds}")
    // clean is exactly corpus minus flagged
    val cleanCount = Decontaminate.clean(corpus, bench, "doc_id", "text",
      minShared = 5).count()
    assert(cleanCount == corpus.count() - flaggedIds.size)
  }

  test("exact dedup digest groups cover every document once") {
    val out = graft.queries.DedupQueries.exactMd5(spark, sfDir)
    val total = out.agg(sum("copies")).collect()(0).getLong(0)
    assert(total == docs.count())
  }
}
