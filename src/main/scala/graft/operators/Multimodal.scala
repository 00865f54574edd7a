package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column conventions + the decode/feature plumbing for
  * binary payloads (images/audio/video) in a training-data lake.
  *
  * Layout convention: one parquet table with
  *   id BIGINT, payload BINARY, meta STRUCT<kind, mime, n_bytes>
  * — payloads stay opaque bytes in columnar storage (parquet keeps the
  * binary column contiguous and prunable; scans that don't touch
  * `payload` never read those pages).
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): [[StubDecoder]] produces deterministic fake
  * features from the bytes. The Spark-side plumbing — schema, typed
  * Dataset boundary, per-partition decoder init, batch iteration — is
  * the real, tested part; a libjpeg/ffmpeg decoder would replace ONLY
  * the StubDecoder body. (This is the Scala analogue of a Pandas UDF
  * over mapInPandas: mapPartitions gives the same one-init-per-batch
  * shape without a Python worker boundary.)
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte], kind: String)
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
    checksum: Long, feature: Array[Float])

  /** Pack a text corpus as a multimodal table (text bytes standing in
    * for opaque media payloads in the harness).
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text").as("kind"),
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes")).as("meta"))

  /** STUB media decoder — deterministic fake in place of the codec. */
  object StubDecoder {
    /** One decoder instance per partition (mirrors per-partition model
      * init, the fix for the reference's per-element client setup, D5).
      */
    def open(): StubDecoder = new StubDecoder
  }

  final class StubDecoder {
    /** ??? in spirit: a real implementation would decode pixels/samples.
      * The fake: FNV-1a checksum + an 8-dim byte-histogram feature, so
      * tests get stable, content-sensitive values.
      */
    def decode(payload: Array[Byte]): (Long, Array[Float]) = {
      var h = 0xcbf29ce484222325L
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
        hist((payload(i) & 0xff) >>> 5) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      (h, hist.map(_ / n))
    }
  }

  /** Decode/feature-extract over payload batches: one decoder per
    * partition, streaming iteration (never materializes a partition).
    */
  def extractFeatures(packed: DataFrame): Dataset[MediaFeatures] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("id"), col("payload"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val decoder = StubDecoder.open()
        rows.map { r =>
          val (checksum, feature) = decoder.decode(r.payload)
          MediaFeatures(r.id, r.kind, r.payload.length, checksum, feature)
        }
      }
  }

  final case class MediaScore(id: Long, batch_size: Int, score: Double)

  /** Batched model inference shape: rows stream through
    * `mapPartitions` in fixed-size batches — one "model call" per
    * batch, exactly the GPU-inference access pattern (weights loaded
    * once per partition, inputs tensorized `batchSize` at a time,
    * results zipped back to ids). The stub model scores each payload
    * deterministically (bytes mod 1000 / 10), so the whole batched
    * path oracle-checks; a real model swaps the stub, the Spark-side
    * plumbing — partition-local batching, bounded memory (only one
    * batch materialized), id alignment — is what this operator pins.
    */
  def batchedInference(packed: DataFrame, batchSize: Int = 32)
      : Dataset[MediaScore] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed
      .select(col("id"), col("payload"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val model = StubDecoder.open() // per-partition "weights load"
        rows.grouped(batchSize).flatMap { batch =>
          // one vectorized call per batch in a real deployment
          val scores = batch.map { r =>
            val s = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
            (s % 1000L) / 10.0
          }
          batch.lazyZip(scores).map { case (r, s) =>
            MediaScore(r.id, batch.length, s)
          }
        }
      }
  }

  /** Resize stub: nearest-neighbor downsample of the payload to a
    * fixed `outLen` bytes (index i samples byte floor(i*len/outLen)).
    * The plumbing — binary in, fixed-size binary out, pure row-local
    * map — is exactly an image resize kernel's shape; a real codec
    * would decode, resample pixels, and re-encode in place of the
    * byte sampling.
    */
  def resizePayload(packed: DataFrame, outLen: Int): DataFrame = {
    val resizeUdf = udf { payload: Array[Byte] =>
      if (payload == null || payload.isEmpty) Array.empty[Byte]
      else Array.tabulate(outLen) { i =>
        payload((i.toLong * payload.length / outLen).toInt)
      }
    }
    packed.select(col("id"), resizeUdf(col("payload")).as("resized"))
  }

  /** Frame-sampling stub for video-like payloads: every strideth byte
    * window becomes a "frame" (slice plumbing is real; a codec would
    * replace the windowing).
    */
  def sampleFrames(packed: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    packed.select(
      col("id"),
      posexplode(sequence(lit(0),
        greatest((octet_length(col("payload")) - frameBytes).cast("int"), lit(0)),
        lit(stride))))
      .toDF("id", "frame_idx", "offset")
      .withColumn("frame_idx", col("frame_idx").cast("long"))

  /** Perceptual difference-hash (dHash) of a payload: the payload is
    * reduced to a 8x9 grid of proportional-slice byte means (the stub
    * "downscale" — a codec would decode + resample pixels), and each
    * of the 64 bits compares horizontally adjacent cells. Proportional
    * slicing makes the grid — and thus the hash — stable under small
    * local edits, the property dHash has for images.
    */
  def dhash64(payload: Array[Byte]): Long = {
    val rows = 8
    val cols = 9
    val n = payload.length
    if (n == 0) return 0L
    val grid = new Array[Double](rows * cols)
    var cell = 0
    while (cell < rows * cols) {
      val from = (cell.toLong * n / (rows * cols)).toInt
      val to = math.max(((cell + 1).toLong * n / (rows * cols)).toInt, from + 1)
      var s = 0.0
      var i = from
      while (i < to && i < n) { s += (payload(i) & 0xFF); i += 1 }
      grid(cell) = s / math.max(to - from, 1)
      cell += 1
    }
    var h = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        h = (h << 1) | (if (grid(r * cols + c) < grid(r * cols + c + 1)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    h
  }

  private val dhashUdf = udf((p: Array[Byte]) => dhash64(p))

  /** (id, dhash) fingerprints for a packed multimodal table. */
  def dhashes(packed: DataFrame): DataFrame =
    packed.select(col("id"), dhashUdf(col("payload")).as("dhash"))

  /** Visual near-dup pairs by dHash: band blocking (identical to the
    * SimHash dedup shape) then exact Hamming verify. The band count
    * adapts to the requested radius so the pigeonhole recall guarantee
    * ALWAYS holds: b bands catch every pair within Hamming b-1, so
    * maxHamming <= 3 blocks on 4 x 16-bit bands and 4..7 on 8 x 8-bit
    * bands. Radii above 7 would need 16 x 4-bit bands whose buckets
    * collide a 1/16th of the corpus each; rejected rather than silently
    * under-recalled. Candidate join carries (id, hash) only.
    *
    * COST CLIFF at maxHamming >= 4: an 8-bit band bucket collides
    * ~1/256 of a random corpus (vs ~1/65536 for the 16-bit bands), so
    * candidate volume grows ~256x and quadratically in corpus size —
    * correctness is unaffected (exact Hamming verify) but a large
    * corpus at the wide radius needs `bucketCap`: buckets holding more
    * than that many signatures are dropped from the candidate join
    * (the shingle path's dfCap bargain — pairs agreeing ONLY on a
    * too-hot band are traded for bounded cost; near-identical images
    * still collide on their other, rarer bands). 0 = uncapped.
    */
  def dhashPairs(packed: DataFrame, maxHamming: Int = 3,
      bucketCap: Int = 0): DataFrame =
    hammingPairs(dhashes(packed).withColumnRenamed("dhash", "hash"),
      maxHamming, bucketCap)

  /** Banded-blocking Hamming pair join over any 64-bit fingerprint
    * table `(id, hash)` — shared by the dHash and pHash pair queries
    * (see [[dhashPairs]] for the band/radius/bucketCap contract).
    */
  private def hammingPairs(sig0: DataFrame, maxHamming: Int,
      bucketCap: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (got $maxHamming): banded blocking " +
        "guarantees recall only up to bands-1 differing bits")
    val bands = if (maxHamming <= 3) 4 else 8
    val width = 64 / bands
    val mask = (1L << width) - 1
    val sig = sig0.repartition(col("id"))
    val allBandKeys = sig.select(
      col("id"), col("hash"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> shiftright(hash, b * $width) & $mask)")))
      .toDF("id", "hash", "band", "bval")
    val bandKeys =
      if (bucketCap <= 0) allBandKeys
      else {
        val cool = allBandKeys.groupBy("band", "bval")
          .agg(count(lit(1)).as("bdf"))
          .where(col("bdf") <= bucketCap)
          .select("band", "bval")
        allBandKeys.join(broadcast(cool), Seq("band", "bval"))
      }
    bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("ida"), col("b.id").as("idb"),
        bit_count(col("a.hash").bitwiseXOR(col("b.hash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Perceptual DCT hash (pHash — public algorithm, e.g. the pHash.org
    * / Zauner 2010 formulation): stub-downscale the payload to a 32x32
    * grid of proportional-slice byte means (the same "decode" contract
    * as [[dhash64]]), orthonormal 2D DCT-II (separable; only the 8x8
    * low-frequency block is computed), then 64 bits = each coefficient
    * compared against the MEDIAN of the 63 non-DC coefficients (the DC
    * bit compares too and is ~always set — documented choice). dHash
    * responds to local gradients; pHash to global spectral structure —
    * the complementary pair real image-dedup stacks run together.
    */
  def phash64(payload: Array[Byte]): Long = {
    val N = 32
    val n = payload.length
    if (n == 0) return 0L
    val g = new Array[Double](N * N)
    var cell = 0
    while (cell < N * N) {
      val from = (cell.toLong * n / (N * N)).toInt
      val to = math.max(((cell + 1).toLong * n / (N * N)).toInt, from + 1)
      var s = 0.0
      var i = from
      while (i < to && i < n) { s += (payload(i) & 0xFF); i += 1 }
      g(cell) = s / math.max(to - from, 1)
      cell += 1
    }
    val cosT = Array.tabulate(8, N)((k, i) =>
      math.cos(math.Pi * (2 * i + 1) * k / (2.0 * N)))
    val alpha = Array.tabulate(8)(k =>
      if (k == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N))
    // rows: N x 8 low-frequency row transforms
    val rowT = Array.ofDim[Double](N, 8)
    var r = 0
    while (r < N) {
      var k = 0
      while (k < 8) {
        var s = 0.0
        var i = 0
        while (i < N) { s += g(r * N + i) * cosT(k)(i); i += 1 }
        rowT(r)(k) = alpha(k) * s
        k += 1
      }
      r += 1
    }
    // columns: the 8 x 8 block
    val co = Array.ofDim[Double](8, 8)
    var l = 0
    while (l < 8) {
      var k = 0
      while (k < 8) {
        var s = 0.0
        var rr = 0
        while (rr < N) { s += rowT(rr)(k) * cosT(l)(rr); rr += 1 }
        co(l)(k) = alpha(l) * s
        k += 1
      }
      l += 1
    }
    val vals = new Array[Double](63)
    var idx = 0
    var a = 0
    while (a < 8) {
      var b = 0
      while (b < 8) {
        if (a != 0 || b != 0) { vals(idx) = co(a)(b); idx += 1 }
        b += 1
      }
      a += 1
    }
    java.util.Arrays.sort(vals)
    val med = vals(31)
    var h = 0L
    a = 0
    while (a < 8) {
      var b = 0
      while (b < 8) {
        h = (h << 1) | (if (co(a)(b) > med) 1L else 0L)
        b += 1
      }
      a += 1
    }
    h
  }

  private val phashUdf = udf((p: Array[Byte]) => phash64(p))

  /** (id, phash) fingerprints for a packed multimodal table. */
  def phashes(packed: DataFrame): DataFrame =
    packed.select(col("id"), phashUdf(col("payload")).as("phash"))

  /** Visual near-dup pairs by pHash — the [[dhashPairs]] machinery
    * over the spectral fingerprint.
    */
  def phashPairs(packed: DataFrame, maxHamming: Int = 3,
      bucketCap: Int = 0): DataFrame =
    hammingPairs(phashes(packed).withColumnRenamed("phash", "hash"),
      maxHamming, bucketCap)
}
