package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.text.{Fingerprint, LangId}

/** Multimodal-column plumbing and the remaining text-analysis operators
  * (language-ID, winnowing fingerprints) registered for the driver.
  * `multimodal_meta`, `multimodal_features`, `multimodal_batch_scores`
  * and the resize/frames plumbing are oracle-checked (the stub decoders
  * are integer arithmetic DuckDB replays exactly); langid/fingerprint
  * use engine-side compiled code with no SQL equivalent (rows-only +
  * specs + dual-SF golden pins).
  */
object MultimodalQueries {

  /** Binary payload metadata (oracle-checked: byte lengths etc.). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.packDocuments(Tables(spark, dir, "documents"))
      .select(
        col("id"), col("meta.kind").as("kind"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").cast("long").as("n_bytes"))
      .orderBy("id")

  /** Stubbed decode + feature extraction (per-partition decoder init).
    * The 8-dim feature vector is flattened to scalar columns f0..f7 for
    * the dump: the driver's compare sorts rows by every column, which an
    * array-typed column breaks (and scalars diff better anyway).
    * Oracle-checked end to end — FNV-1a checksum and float32 histogram
    * both re-derive in DuckDB (see the oracle entry).
    */
  def features(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.packDocuments(Tables(spark, dir, "documents")))
      .toDF()
      .select(col("id") +: col("kind") +: col("n_bytes") +: col("checksum") +:
        (0 until 8).map(i => col("feature")(i).as(s"f$i")): _*)
      .orderBy("id")

  /** Batched-inference plumbing: payloads scored through the
    * fixed-batch mapPartitions path (the GPU access pattern); the stub
    * model is deterministic so the oracle re-derives every score.
    */
  def batchScores(spark: SparkSession, dir: String): DataFrame =
    Multimodal.batchedInference(
        Multimodal.packDocuments(Tables(spark, dir, "documents")),
        batchSize = 32)
      .toDF()
      .select(col("id"), col("score"))
      .orderBy("id")

  /** Frame-sampling plumbing over binary payloads. */
  def frames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.packDocuments(Tables(spark, dir, "documents")),
        frameBytes = 64, stride = 50)
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"), max("offset").as("last_offset"))
      .orderBy("id")

  /** Resize plumbing: nearest-neighbor downsample of every payload to
    * 16 bytes; the dump carries (out_len, byte_sum) scalars. Oracle is
    * the same sampling arithmetic over the ASCII text in DuckDB.
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    val byteSum = udf { b: Array[Byte] =>
      var s = 0L; var i = 0
      while (i < b.length) { s += (b(i) & 0xff); i += 1 }
      s
    }
    Multimodal.resizePayload(
        Multimodal.packDocuments(Tables(spark, dir, "documents")), outLen = 16)
      .select(col("id"),
        octet_length(col("resized")).cast("long").as("out_len"),
        byteSum(col("resized")).as("byte_sum"))
      .orderBy("id")
  }

  /** Language-ID confusion counts against the labeled lang column. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), LangId.langOf(col("text")).as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")

  /** Winnowing-fingerprint copy candidates: docs sharing >= 15 RARE
    * fingerprints (document frequency <= 20). The df-cap is the same
    * blocking bargain as shingle dedup: discriminative fingerprints
    * drive the join, corpus-wide 7-grams (ubiquitous in the tiny-vocab
    * harness corpus) never create quadratic buckets.
    */
  def fingerprintPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(Fingerprint.fingerprints(col("text"))).as("fp"))
      .repartition(col("doc_id"))
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, 20))
    // barrier on the join key: winnowed fingerprints compute once and
    // the self-join reads one reused, co-partitioned exchange
    val fpr = fp.join(broadcast(rare.select("fp")), "fp")
      .repartition(col("fp"))
    val pairs = fpr.as("a").join(fpr.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("shared_fp"))
      .where(col("shared_fp") >= 15)
      .orderBy("ida", "idb")
    pairs
  }

  /** Perceptual near-dup pairs by payload dHash (band blocking +
    * Hamming verify) — the visual-dedup member of the dedup family,
    * on opaque binary payloads. The corpus has no byte-aligned
    * near-dups (its planted pairs are token-level, the shingle
    * family's geometry), so the query plants deterministic corrupted
    * twins of the first docs — the aligned-perturbation case dHash
    * exists for — and recovers them.
    */
  def dhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val packed = Multimodal.packDocuments(Tables(spark, dir, "documents"))
      .select(col("id"), col("payload"))
    val corrupt = udf { p: Array[Byte] =>
      val b = p.clone()
      var i = 7
      while (i < b.length) { b(i) = (b(i) ^ 1).toByte; i += 97 }
      b
    }
    val twins = packed.where(col("id") < 50)
      .select((col("id") + 1000000L).as("id"),
        corrupt(col("payload")).as("payload"))
    Multimodal.dhashPairs(packed.unionByName(twins), maxHamming = 6)
      .orderBy("ida", "idb")
  }

  /** Spectral near-dup pairs by payload pHash — the complementary
    * perceptual fingerprint (dHash sees local gradients, pHash global
    * DCT structure; real image-dedup stacks run both). Same planted
    * corrupted twins; sparse bit-flips leave the low-frequency
    * spectrum nearly unchanged, so pHash recovers them at a TIGHTER
    * radius than dHash needs.
    */
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val packed = Multimodal.packDocuments(Tables(spark, dir, "documents"))
      .select(col("id"), col("payload"))
    val corrupt = udf { p: Array[Byte] =>
      val b = p.clone()
      var i = 7
      while (i < b.length) { b(i) = (b(i) ^ 1).toByte; i += 97 }
      b
    }
    val twins = packed.where(col("id") < 50)
      .select((col("id") + 1000000L).as("id"),
        corrupt(col("payload")).as("payload"))
    Multimodal.phashPairs(packed.unionByName(twins), maxHamming = 3)
      .orderBy("ida", "idb")
  }

  /** Audio-style landmark matching ([[graft.operators.AudioFingerprint]],
    * the Wang 2003 constellation algorithm): plants TIME-SHIFTED
    * copies of the first docs (a 256-byte / 2-hop alien prefix — the
    * crop/shift case the global hashes cannot survive but landmarks
    * exist for) and recovers each at its true relative offset via the
    * offset-histogram vote. Measured (peaks 2, fanout 2): all 30
    * planted twins at >= 147 votes with ZERO spurious pairs at both
    * sf0.001 and sf0.01 — the 60-vote floor sits far under the
    * planted band.
    */
  /** The chirp's per-block tone frequencies — pure integer arithmetic
    * on doc_id, independent of any spectral code. This is the THEORY
    * side of the oracle bake's anchor: an integer-bin cosine's DFT is
    * a single line at its own bin (orthogonality), so every
    * block-aligned frame's top peak must equal the block's frequency.
    */
  private def chirpFreqs(id: Long): Array[Int] = {
    var st = id * 6364136223846793005L + 1442695040888963407L
    def next(): Int = {
      st = st * 6364136223846793005L + 1442695040888963407L
      (((st >>> 33) % 120) + 1).toInt
    }
    Array.fill(13)(next())
  }

  /** Deterministic per-doc PCM synthesis, shared by the query UDF and
    * the oracle-generation bake ([[audioMatchOracleSql]]).
    */
  private def waveBytes(id: Long): Array[Byte] = {
    val freqs = chirpFreqs(id)
    // 128 + is the decode contract's inverse: AudioFingerprint reads
    // (b & 0xFF) - 128, so bytes must carry the unsigned-offset PCM
    // convention (round 10 — the old signed `(127*cos).toByte` bytes
    // decoded to a wave whose harmonics BEAT the fundamental, caught
    // by the bake's theory anchor: doc 0 peaked at 75 = 3 x tone 25)
    Array.tabulate(3200) { i =>
      (128 + 127 * math.cos(2 * math.Pi * freqs(i / 256) * (i % 256) / 256.0))
        .toByte
    }
  }

  private def shiftBytes(p: Array[Byte]): Array[Byte] =
    Array.tabulate(256)(i =>
      (128 + 127 * math.cos(2 * math.Pi * 7 * i / 256.0)).toByte) ++ p

  def audioMatch(spark: SparkSession, dir: String): DataFrame = {
    // Deterministic per-doc PCM synthesis (the stub-decode contract:
    // no codecs in the sandbox, so the "decoded waveform" is a
    // blockwise chirp seeded by doc_id). Raw text bytes are the WRONG
    // fixture for this modality — ASCII prose is spectrally
    // near-identical across documents, which is precisely the
    // degenerate case dfCap prunes; audio-statistics payloads make
    // the landmark geometry real.
    // 256-sample frames -> 128 bins: the constellation needs hash
    // entropy comfortably above corpus size or df-capping prunes
    // everything (measured: 64-sample frames' ~2.9k hash space
    // degenerates at 500 docs)
    val wave = udf(waveBytes _)
    // Constant 500-doc slice at every SF: the synthetic chirp's hash
    // entropy is frameSize-bounded (~48k (f1,f2,dt) combos — real
    // audio has 2^30+), so landmark density must stay constant or the
    // df-capped join's candidate volume grows quadratically in corpus
    // size for FIXTURE reasons, not operator reasons (measured: 250 s
    // at 5000 docs vs 1.5 s at 500). The operator's scale story is the
    // df-cap + the offset vote, both exercised identically on the
    // bounded slice.
    val packed = Tables(spark, dir, "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id").as("id"), wave(col("doc_id")).as("payload"))
    // shifted twins: a 256-byte (2-hop) alien prefix — the crop/shift
    // case constellation landmarks exist to survive
    val shift = udf(shiftBytes _)
    val twins = packed.where(col("id") < 30)
      .select((col("id") + 1000000L).as("id"),
        shift(col("payload")).as("payload"))
    graft.operators.AudioFingerprint.matches(
        packed.unionByName(twins), minVotes = 60,
        frameSize = 256, hop = 128, peaksPerFrame = 2, fanout = 2)
      .orderBy("ida", "idb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_batch_scores" -> batchScores,
    "multimodal_dhash_pairs" -> dhashPairs,
    "multimodal_phash_pairs" -> phashPairs,
    "multimodal_audio_match" -> audioMatch,
    "multimodal_meta" -> meta,
    "multimodal_features" -> features,
    "multimodal_frames" -> frames,
    "multimodal_resize" -> resize,
    "text_langid" -> langId,
    "text_fingerprint_pairs" -> fingerprintPairs)

  /** The audio-match oracle: the DFT is the only floating-point stage,
    * and the constellation is a pure function of doc_id (the synthetic
    * wave ignores the text), so the integer peak bins for EVERY
    * possible id (0..499 base, +1000000 twins) bake in as a VALUES
    * table at oracle-generation time; the SQL filters them by the
    * documents actually present at the running SF and replays the
    * landmark pairing, df-cap, offset-histogram vote, and best-offset
    * pick relationally. Round-7: converted from rows-only.
    *
    * THEORY ANCHORS (round 10 — the bake is no longer purely
    * self-referential on framePeaks):
    *  - every block-aligned frame's TOP peak is REQUIRED at bake time
    *    to equal the block's [[chirpFreqs]] tone — the closed-form
    *    single-line spectrum of an integer-bin cosine (orthogonality);
    *    a framePeaks regression that moved a dominant line now aborts
    *    oracle generation instead of baking its own bug in;
    *  - twin rows for frames >= 2 are NOT re-measured: the 256-sample
    *    prefix is exactly 2 hops, so twin frame t covers byte-for-byte
    *    the same samples as base frame t-2 — their peaks are copied
    *    under the exact shift identity (the Fourier shift theorem's
    *    discrete, quantization-proof form). Only the 2 prefix frames
    *    per twin are measured, with the prefix tone's top peak
    *    REQUIRED at its theoretical bin 7.
    * What remains code-derived: the SECOND peak of pure frames, which
    * is the argmax of quantization noise (the ideal spectrum is zero
    * off the line, so no closed form exists for the byte-rounded
    * residue), and both peaks of block-straddling frames.
    */
  private def audioMatchOracleSql: String = {
    val basePk: Seq[(Long, Array[Array[Int]])] = (0L until 500L).map { id =>
      val pk = graft.operators.AudioFingerprint.framePeaks(
        waveBytes(id), frameSize = 256, hop = 128, peaksPerFrame = 2)
      val fr = chirpFreqs(id)
      pk.indices.filter(_ % 2 == 0).foreach { t =>
        require(pk(t)(0) == fr(t / 2),
          s"theory anchor violated: doc $id frame $t top peak ${pk(t)(0)} " +
            s"!= block tone ${fr(t / 2)} — framePeaks lost a spectral line")
      }
      id -> pk
    }
    def rows(id: Long, t0: Int, pk: Seq[Array[Int]]): Seq[String] =
      for {
        (ps, dt) <- pk.zipWithIndex
        f <- ps
      } yield s"($id,${t0 + dt},$f)"
    val base = basePk.flatMap { case (id, pk) => rows(id, 0, pk.toSeq) }
    val twins = basePk.take(30).flatMap { case (id0, pk) =>
      val id = id0 + 1000000L
      val headPk = graft.operators.AudioFingerprint.framePeaks(
        shiftBytes(waveBytes(id0)), frameSize = 256, hop = 128,
        peaksPerFrame = 2).take(2)
      require(headPk(0)(0) == 7,
        s"theory anchor violated: twin $id prefix frame top peak " +
          s"${headPk(0)(0)} != tone bin 7")
      // frames >= 2: exact shift identity — copy the base rows
      rows(id, 0, headPk.toSeq) ++ rows(id, 2, pk.toSeq)
    }
    s"""WITH pk0(id, t, f) AS (VALUES ${(base ++ twins).mkString(",")}),
ids AS (
  SELECT doc_id AS id FROM documents WHERE doc_id < 500
  UNION ALL
  SELECT doc_id + 1000000 FROM documents WHERE doc_id < 30
),
pk AS (SELECT pk0.* FROM pk0 JOIN ids USING (id)),
lm AS (
  SELECT a.id, a.f * 65536 + b.f * 256 + (b.t - a.t) AS hash, a.t
  FROM pk a JOIN pk b ON b.id = a.id AND b.t - a.t IN (1, 2)
),
rare AS (
  SELECT hash FROM lm GROUP BY hash
  HAVING count(DISTINCT id) BETWEEN 2 AND 50
),
lr AS (SELECT lm.* FROM lm JOIN rare USING (hash)),
votes AS (
  SELECT a.id AS ida, b.id AS idb, b.t - a.t AS off,
    CAST(count(*) AS BIGINT) AS votes
  FROM lr a JOIN lr b ON a.hash = b.hash AND a.id < b.id
  GROUP BY 1, 2, 3
),
best AS (
  SELECT ida, idb, votes, off FROM (
    SELECT *, row_number() OVER (PARTITION BY ida, idb
      ORDER BY votes DESC, off) AS rn FROM votes) WHERE rn = 1
)
SELECT CAST(ida AS BIGINT) AS ida, CAST(idb AS BIGINT) AS idb,
  votes, CAST(off AS BIGINT) AS "offset"
FROM best WHERE votes >= 60
ORDER BY ida, idb"""
  }

  val oracle: Map[String, String] = Map(
    "multimodal_audio_match" -> audioMatchOracleSql,
    // trigram-cosine language ID replays exactly: the seed profiles
    // are baked in as integer (lang, gram, cnt) rows, and every score
    // is dot/(n*pn) where dot and the squared norms are integer sums
    // (exact in doubles regardless of order) — sqrt and divide on
    // identical doubles are bit-deterministic, so the per-doc argmax
    // (tie: lang ascending, the detect() sort order) matches.
    // Round-7: converted from rows-only.
    "text_langid" -> {
      val prof = graft.text.LangId.profileRows
        .map { case (l, g, v) => s"('$l','$g',$v)" }.mkString(", ")
      s"""WITH prof(plang, gram, cnt) AS (VALUES $prof),
cl AS (
  SELECT doc_id, lang,
    regexp_replace(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'),
      ' +', ' ', 'g') AS c
  FROM documents
),
tg AS (
  SELECT doc_id, substr(c, CAST(i AS INT), 3) AS gram,
    CAST(count(*) AS BIGINT) AS v
  FROM (SELECT doc_id, c, unnest(range(1, length(c) - 1)) AS i
        FROM cl WHERE length(c) >= 3)
  GROUP BY doc_id, gram
),
nn AS (
  SELECT doc_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS n
  FROM tg GROUP BY doc_id
),
pnorm AS (
  SELECT plang, sqrt(CAST(sum(cnt * cnt) AS DOUBLE)) AS pn
  FROM prof GROUP BY plang
),
dots AS (
  SELECT tg.doc_id, p.plang, CAST(sum(tg.v * p.cnt) AS DOUBLE) AS dotp
  FROM tg JOIN prof p ON tg.gram = p.gram
  GROUP BY tg.doc_id, p.plang
),
scored AS (
  SELECT nn.doc_id, pnorm.plang,
    coalesce(dots.dotp, 0.0) / (nn.n * pnorm.pn) AS score
  FROM nn CROSS JOIN pnorm
  LEFT JOIN dots ON dots.doc_id = nn.doc_id AND dots.plang = pnorm.plang
),
pred AS (
  SELECT doc_id, plang AS predicted
  FROM (SELECT doc_id, plang,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, plang) AS rnk
        FROM scored)
  WHERE rnk = 1
)
SELECT cl.lang, coalesce(pred.predicted, 'und') AS predicted,
  count(*) AS n_docs
FROM cl LEFT JOIN pred ON cl.doc_id = pred.doc_id
GROUP BY cl.lang, predicted ORDER BY cl.lang, predicted"""
    },
    // dHash visual near-dup pairs replay exactly: grid cells are
    // integer byte sums over proportional slices divided as doubles
    // (exact ints -> deterministic division), bits are plain double
    // comparisons, the 64-bit hash assembles from a HUGEINT power
    // table, and banded Hamming blocking is integer shifts + xor +
    // bit_count — DuckDB reproduces the planted-corrupted-twin query
    // end to end. Round-7: converted from rows-only.
    "multimodal_dhash_pairs" -> {
      val pw = (0 until 64)
        .map(k => s"($k, ${java.lang.Long.toUnsignedString(1L << (63 - k))}::HUGEINT)")
        .mkString(", ")
      val bp = (0 until 8)
        .map(b => s"($b, ${1L << (8 * b)}::HUGEINT)").mkString(", ")
      s"""WITH pw(k, w) AS (VALUES $pw),
bp(band, bw) AS (VALUES $bp),
base AS (
  SELECT doc_id AS id,
    list_transform(range(1, length(text) + 1),
      i -> ord(substr(text, CAST(i AS INT), 1))) AS b
  FROM documents
),
tw AS (
  SELECT id + 1000000 AS id,
    list_transform(range(1, len(b) + 1),
      i -> CASE WHEN (i - 1) >= 7 AND (i - 1 - 7) % 97 = 0
        THEN xor(b[CAST(i AS INT)]::BIGINT, 1)::INT
        ELSE b[CAST(i AS INT)] END) AS b
  FROM base WHERE id < 50
),
packed AS (SELECT id, b FROM base UNION ALL SELECT id, b FROM tw),
cells AS (
  SELECT id, CAST(cell AS INT) AS cell,
    CAST(list_sum(b[CAST((cell * len(b)) // 72 + 1 AS INT) :
                    CAST(greatest(((cell + 1) * len(b)) // 72,
                                  (cell * len(b)) // 72 + 1) AS INT)])
         AS DOUBLE)
      / (greatest(((cell + 1) * len(b)) // 72,
                  (cell * len(b)) // 72 + 1) - (cell * len(b)) // 72) AS g
  FROM (SELECT id, b, unnest(range(0, 72)) AS cell FROM packed
        WHERE len(b) > 0)
),
hs AS (
  SELECT a.id,
    sum(CASE WHEN a.g < c2.g THEN p.w ELSE 0::HUGEINT END) AS hu
  FROM cells a
  JOIN cells c2 ON c2.id = a.id AND c2.cell = a.cell + 1
  JOIN pw p ON p.k = (a.cell // 9) * 8 + (a.cell % 9)
  WHERE a.cell % 9 < 8
  GROUP BY a.id
),
sig AS (
  SELECT id,
    CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS h,
    hu
  FROM hs
),
bands AS (
  SELECT s.id, s.h, bp.band, (s.hu // bp.bw) % 256 AS bval
  FROM sig s CROSS JOIN bp
),
cand AS (
  SELECT DISTINCT a.id AS ida, b2.id AS idb,
    bit_count(xor(a.h, b2.h)) AS hamming
  FROM bands a JOIN bands b2
    ON a.band = b2.band AND a.bval = b2.bval AND a.id < b2.id
)
SELECT ida, idb, CAST(hamming AS INT) AS hamming FROM cand
WHERE hamming <= 6 ORDER BY ida, idb"""
    },
    // pHash replays exactly too — the subtle part is float parity of
    // the DCT: the cosine/alpha constants are generated HERE by the
    // SAME JVM math.cos the expression uses (Double.toString
    // round-trips bit-exactly through DuckDB's parser), grid means are
    // exact-int divisions, and both engines run the IDENTICAL ordered
    // fold (Scala's ascending-i loop == list_reduce over an ascending
    // list_transform), so every coefficient — and the median compare —
    // is bit-deterministic. Round-7: converted from rows-only.
    "multimodal_phash_pairs" -> {
      val n = 32
      val ctl = "[" + (0 until 8).map { k =>
        "[" + (0 until n).map(i =>
          math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n)).toString)
          .mkString(",") + "]"
      }.mkString(",") + "]"
      val al = "[" + (0 until 8).map(k =>
        (if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)).toString)
        .mkString(",") + "]"
      val pw = (0 until 64)
        .map(k => s"($k, ${java.lang.Long.toUnsignedString(1L << (63 - k))}::HUGEINT)")
        .mkString(", ")
      val bp = (0 until 4)
        .map(b => s"($b, ${1L << (16 * b)}::HUGEINT)").mkString(", ")
      s"""WITH pw(k, w) AS (VALUES $pw),
bp(band, bw) AS (VALUES $bp),
base AS (
  SELECT doc_id AS id,
    list_transform(range(1, length(text) + 1),
      i -> ord(substr(text, CAST(i AS INT), 1))) AS b
  FROM documents
),
tw AS (
  SELECT id + 1000000 AS id,
    list_transform(range(1, len(b) + 1),
      i -> CASE WHEN (i - 1) >= 7 AND (i - 1 - 7) % 97 = 0
        THEN xor(b[CAST(i AS INT)]::BIGINT, 1)::INT
        ELSE b[CAST(i AS INT)] END) AS b
  FROM base WHERE id < 50
),
packed AS (SELECT id, b FROM base UNION ALL SELECT id, b FROM tw),
cells AS (
  SELECT id, CAST(cell AS INT) AS cell,
    CAST(list_sum(b[CAST((cell * len(b)) // 1024 + 1 AS INT) :
                    CAST(greatest(((cell + 1) * len(b)) // 1024,
                                  (cell * len(b)) // 1024 + 1) AS INT)])
         AS DOUBLE)
      / (greatest(((cell + 1) * len(b)) // 1024,
                  (cell * len(b)) // 1024 + 1) - (cell * len(b)) // 1024) AS g
  FROM (SELECT id, b, unnest(range(0, 1024)) AS cell FROM packed
        WHERE len(b) > 0)
),
gl AS (SELECT id, list(g ORDER BY cell) AS gl FROM cells GROUP BY id),
dct AS (
  SELECT id,
    list_transform(range(0, 32), r ->
      list_transform(range(0, 8), k ->
        $al[CAST(k + 1 AS INT)] *
        list_reduce(list_prepend(0.0, list_transform(range(0, 32),
          i -> gl[CAST(r * 32 + i + 1 AS INT)] *
               $ctl[CAST(k + 1 AS INT)][CAST(i + 1 AS INT)])),
          (a, x) -> a + x))) AS rowt
  FROM gl
),
co AS (
  SELECT id,
    list_transform(range(0, 8), l ->
      list_transform(range(0, 8), k ->
        $al[CAST(l + 1 AS INT)] *
        list_reduce(list_prepend(0.0, list_transform(range(0, 32),
          rr -> rowt[CAST(rr + 1 AS INT)][CAST(k + 1 AS INT)] *
                $ctl[CAST(l + 1 AS INT)][CAST(rr + 1 AS INT)])),
          (a, x) -> a + x))) AS co
  FROM dct
),
med AS (
  SELECT id, co, list_sort(flatten(co)[2:64])[32] AS med
  FROM co
),
hs AS (
  SELECT m.id,
    sum(CASE WHEN flatten(m.co)[CAST(p.k + 1 AS INT)] > m.med
        THEN p.w ELSE 0::HUGEINT END) AS hu
  FROM med m CROSS JOIN pw p
  GROUP BY m.id
),
sig AS (
  SELECT id,
    CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
      THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS h,
    hu
  FROM hs
),
bands AS (
  SELECT s.id, s.h, bp.band, (s.hu // bp.bw) % 65536 AS bval
  FROM sig s CROSS JOIN bp
),
cand AS (
  SELECT DISTINCT a.id AS ida, b2.id AS idb,
    bit_count(xor(a.h, b2.h)) AS hamming
  FROM bands a JOIN bands b2
    ON a.band = b2.band AND a.bval = b2.bval AND a.id < b2.id
)
SELECT ida, idb, CAST(hamming AS INT) AS hamming FROM cand
WHERE hamming <= 3 ORDER BY ida, idb"""
    },
    // winnowing fingerprints replay exactly: the rolling 7-gram hash
    // is by construction the polynomial sum c_0*257^6 + .. + c_6 mod
    // 2^61-1 (every term < 3.6e16 so plain BIGINT arithmetic is
    // exact), and the winnow pick — rightmost minimum per 4-window,
    // then DISTINCT — is a window-rank over (hash asc, pos desc).
    // The consecutive-duplicate suppression in the Scala reference is
    // invisible to the DISTINCT set, so the SETS match even though the
    // pick sequences differ. Round-7: converted from rows-only.
    "text_fingerprint_pairs" ->
      """WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents
),
kh AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
    (ord(substr(s, CAST(i + 1 AS INT), 1)) * 288136807515649 +
     ord(substr(s, CAST(i + 2 AS INT), 1)) * 1121154893057 +
     ord(substr(s, CAST(i + 3 AS INT), 1)) * 4362470401 +
     ord(substr(s, CAST(i + 4 AS INT), 1)) * 16974593 +
     ord(substr(s, CAST(i + 5 AS INT), 1)) * 66049 +
     ord(substr(s, CAST(i + 6 AS INT), 1)) * 257 +
     ord(substr(s, CAST(i + 7 AS INT), 1))) % 2305843009213693951 AS h
  FROM (SELECT doc_id, s, unnest(range(0, length(s) - 6)) AS i
        FROM norm WHERE length(s) >= 7)
),
nh AS (SELECT doc_id, count(*) AS n FROM kh GROUP BY doc_id),
winnowed AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT k.doc_id, k.h,
      row_number() OVER (PARTITION BY k.doc_id, w.st
        ORDER BY k.h ASC, k.pos DESC) AS rk
    FROM (SELECT doc_id, unnest(range(0, n - 3)) AS st
          FROM nh WHERE n >= 4) w
    JOIN kh k ON k.doc_id = w.doc_id
      AND k.pos BETWEEN w.st AND w.st + 3
  ) WHERE rk = 1
  UNION
  SELECT kh.doc_id, min(kh.h) AS h
  FROM kh JOIN nh ON kh.doc_id = nh.doc_id
  WHERE nh.n BETWEEN 1 AND 3 GROUP BY kh.doc_id
),
rare AS (
  SELECT h FROM winnowed GROUP BY h HAVING count(*) BETWEEN 2 AND 20
),
fpr AS (SELECT doc_id, h FROM winnowed JOIN rare USING (h))
SELECT a.doc_id AS ida, b.doc_id AS idb,
  CAST(count(*) AS BIGINT) AS shared_fp
FROM fpr a JOIN fpr b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY ida, idb HAVING count(*) >= 15
ORDER BY ida, idb""",
    // the stub decoder is pure integer arithmetic over the payload
    // bytes (ASCII text in this harness), so DuckDB re-derives it
    // exactly: FNV-1a via HUGEINT modular list_reduce, the 8-bin byte
    // histogram as float32 divisions (IEEE single division is
    // deterministic, so the f columns match bit-for-bit). Round-7:
    // converted from rows-only.
    "multimodal_features" -> {
      val fCols = (0 until 8).map(k =>
        s"  CAST(len(list_filter(b, x -> x // 32 = $k)) AS FLOAT) /\n" +
          s"    CAST(greatest(len(b), 1) AS FLOAT) AS f$k").mkString(",\n")
      s"""WITH bs AS (
  SELECT doc_id AS id,
    list_transform(range(1, length(text) + 1),
      i -> ascii(substr(text, CAST(i AS INT), 1))) AS b
  FROM documents
), h AS (
  SELECT id, b,
    list_reduce(list_prepend(14695981039346656037::HUGEINT,
      list_transform(b, x -> x::HUGEINT)),
      (acc, x) -> (xor(acc, x) * 1099511628211::HUGEINT)
        % 18446744073709551616::HUGEINT) AS hu
  FROM bs
)
SELECT id, 'text' AS kind, CAST(len(b) AS INT) AS n_bytes,
  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
    THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT)
    AS checksum,
$fCols
FROM h ORDER BY id"""
    },
    "multimodal_batch_scores" ->
      """SELECT doc_id AS id,
CAST((CAST(list_sum(list_transform(range(1, len(text) + 1),
  i -> ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) % 1000)
  AS DOUBLE) / 10.0 AS score
FROM documents ORDER BY id""",
    "multimodal_meta" ->
      """SELECT doc_id AS id, 'text' AS kind, 'text/plain' AS mime,
CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents ORDER BY id""",
    // frame sampling is pure stride arithmetic over the payload length:
    // offsets are 0, 50, ..., greatest(len-64, 0) so the count and the
    // last offset close-form from the byte length
    "multimodal_frames" ->
      """WITH m AS (
  SELECT doc_id AS id,
    greatest(octet_length(encode(text)) - 64, 0) AS hi
  FROM documents
)
SELECT id, CAST(hi // 50 + 1 AS BIGINT) AS n_frames,
  CAST((hi // 50) * 50 AS INTEGER) AS last_offset
FROM m ORDER BY id""",
    // same nearest-neighbor sampling over the (pure-ASCII) text: byte
    // at floor(i*len/16), summed
    "multimodal_resize" ->
      """SELECT doc_id AS id, CAST(16 AS BIGINT) AS out_len,
CAST(list_sum(list_transform(range(0, 16),
  i -> ascii(substr(text,
    CAST((i * length(text)) // 16 AS INTEGER) + 1, 1)))) AS BIGINT)
  AS byte_sum
FROM documents ORDER BY id""")
}
