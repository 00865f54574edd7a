package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Document deduplication operators for training-data pipelines, designed
  * shuffle-bounded for 100 TB corpora:
  *
  *  - exact: one hash-groupBy, the only shuffle is on the digest.
  *  - shingle-Jaccard: inverted-index blocking (explode shingles, join on
  *    shared shingle) with a document-frequency cap so hot shingles never
  *    create quadratic candidate blowup; exact verification only on the
  *    surviving candidate pairs.
  *  - MinHash-LSH: constant-size signatures (k permutations) per doc,
  *    banded into buckets; candidates come from bucket equi-joins —
  *    never a cross join — then exact-verified.
  *  - SimHash: 64-bit fingerprint, 16-bit band blocking, Hamming-verified.
  *
  * All per-document math is codegen'd higher-order expressions; the plan
  * is scan -> narrow transforms -> explode -> hash join(s).
  */
object Dedup {

  /** Word n-gram shingles of a token array (1-based element_at).
    * Empty array (typed) when the doc has fewer than n tokens.
    */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(tokens, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, shs) with distinct word-3-gram shingles per document. */
  def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      shingles(TextOps.tokens(col(textCol)), 3).as("shs"))
      .where(size(col("shs")) > 0)

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** Exact-verify candidate (ida, idb) pairs against the shingle sets,
    * keeping pairs with Jaccard >= threshold.
    */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    pairs
      .join(sh.select(col("doc_id").as("ida"), col("shs").as("sha")), "ida")
      .join(sh.select(col("doc_id").as("idb"), col("shs").as("shb")), "idb")
      .select(col("ida"), col("idb"),
        round(jaccard(col("sha"), col("shb")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** Near-dup pairs via inverted-index blocking + exact Jaccard.
    * `dfCap` drops shingles appearing in more than dfCap docs from the
    * candidate join (the verify step still uses the full sets, so
    * verified scores are exact; only recall of pairs sharing NOTHING
    * but hot shingles is traded, the standard blocking bargain).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, dfCap: Int = 50): DataFrame = {
    val sh = shingled(docs, idCol, textCol)
    val ex = sh.select(col("doc_id"), explode(col("shs")).as("s"))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap && col("df") >= 2)
    val exc = ex.join(broadcast(rare.select("s")), "s")
    val cand = exc.as("a").join(exc.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    verifyJaccard(cand, sh, threshold)
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** MinHash signature params (a, b) for h_i(x) = (a*x + b) mod p.
    * Deterministic seed so runs and tests are reproducible. Inputs are
    * first reduced mod p (< 2^31) so a*x stays < 2^62: no ANSI overflow.
    */
  private def perms(numPerm: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numPerm)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
  }

  /** (doc_id, sig) MinHash signatures from shingle sets. */
  def minhashSignatures(sh: DataFrame, numPerm: Int): DataFrame = {
    val hx = transform(col("shs"), s => pmod(xxhash64(s), lit(MersennePrime)))
    val sig = array(perms(numPerm).map { case (a, b) =>
      array_min(transform(col("hx"),
        x => pmod(x * lit(a) + lit(b), lit(MersennePrime))))
    }: _*)
    sh.withColumn("hx", hx).select(col("doc_id"), sig.as("sig"))
  }

  /** MinHash-LSH near-dup pairs: band the signature, bucket-join, then
    * exact-verify Jaccard >= threshold. numPerm = bands * rowsPerBand.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sh = shingled(docs, idCol, textCol)
    val sig = minhashSignatures(sh, bands * rowsPerBand)
    val bandKeys = sig.select(
      col("doc_id"),
      explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as("bkey"))
    val cand = bandKeys.as("a").join(bandKeys.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** 64-bit SimHash over token hashes: bit j is the sign of the sum of
    * (+1/-1) votes from each token's hash bit j. Built with SQL lambda
    * expressions because shiftright's shift amount must be an expression
    * (the Scala functions API only takes a literal Int).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("hx", expr("transform(array_distinct(toks), t -> xxhash64(t))"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 63), 0L, (acc, j) ->
          |  acc + if(aggregate(hx, 0L, (a, x) -> a + (shiftright(x, j) & 1L) * 2 - 1) > 0,
          |           shiftleft(1L, j), 0L))""".stripMargin).as("simhash"))

  /** SimHash near-dup pairs: 4 x 16-bit band blocking (a pair within
    * Hamming distance <= 3 shares at least one exact band by pigeonhole;
    * wider distances are probabilistic), verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val sig = simhash(docs, idCol, textCol)
    val bandKeys = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)")))
      .toDF("doc_id", "simhash", "band", "bval")
    val cand = bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
    cand.where(col("hamming") <= maxHamming)
  }
}
