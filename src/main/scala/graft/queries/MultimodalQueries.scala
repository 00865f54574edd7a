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
    val wave = udf { id: Long =>
      var st = id * 6364136223846793005L + 1442695040888963407L
      def next(): Int = {
        st = st * 6364136223846793005L + 1442695040888963407L
        (((st >>> 33) % 120) + 1).toInt
      }
      val freqs = Array.fill(13)(next())
      Array.tabulate(3200) { i =>
        (127 * math.cos(2 * math.Pi * freqs(i / 256) * (i % 256) / 256.0))
          .toByte
      }
    }
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
    val shift = udf { p: Array[Byte] =>
      Array.tabulate(256)(i =>
        (127 * math.cos(2 * math.Pi * 7 * i / 256.0)).toByte) ++ p
    }
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

  val oracle: Map[String, String] = Map(
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
