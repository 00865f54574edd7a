package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio fingerprinting by spectral-peak constellation landmarks —
  * the Shazam family (public algorithm: Wang 2003, "An Industrial-
  * Strength Audio Search Algorithm"). Complements the image hashes
  * (dHash/pHash): those are GLOBAL fingerprints; landmarks are LOCAL
  * and anchored in time, which is what makes matching robust to
  * TIME SHIFT and cropping — the property this operator exists for
  * and the one the spec pins.
  *
  * Decode contract matches the other multimodal ops: the sandbox has
  * no codecs, so payload bytes stand in for PCM samples
  * deterministically ((b & 0xFF) - 128). The Spark-side shapes — the
  * landmark schema, the hash equi-join, the offset-histogram vote —
  * are the real thing and carry over unchanged when a real decoder
  * replaces the stub.
  *
  * Pipeline per payload (all inside one UDF call per row, emitting the
  * landmark list):
  *  1. frame the samples (frameSize window, hop stride);
  *  2. spectrum magnitude per frame (radix-2 FFT for power-of-two
  *     frames — every registered size; naive DFT fallback otherwise);
  *  3. top `peaksPerFrame` bins per frame (ties -> lower bin) = the
  *     constellation;
  *  4. each peak pairs with peaks up to `fanout` frames ahead ->
  *     landmark hash (f1, f2, dt) packed in a long, anchored at t1.
  *
  * MATCHING is pure relational algebra and is where scale lives: an
  * equi-join on the landmark hash (df-capped against degenerate hot
  * hashes — the shingle dfCap bargain), then the Wang offset-
  * histogram: votes grouped by (ida, idb, t2 - t1); a true match
  * concentrates its votes at ONE offset (the relative shift), noise
  * spreads uniformly. Everything after the UDF is joins + hash aggs.
  */
object AudioFingerprint {

  /** Landmark list of one payload: (hash, t) pairs packed as longs
    * (hash << 20 | t, t < 2^20 frames) to keep the UDF return type a
    * primitive array.
    */
  /** Per-frameSize DFT twiddle tables, built once per JVM: every frame
    * uses the same cos/sin lattice, and computing it per sample was
    * measured as ~10x the whole query (780M transcendental calls at
    * sf0.1). Values are math.cos/sin of the IDENTICAL angle expression
    * the inline form used, so fingerprints are bit-identical.
    */
  private val trigCache = scala.collection.concurrent.TrieMap
    .empty[Int, (Array[Array[Double]], Array[Array[Double]])]
  private def trig(frameSize: Int)
      : (Array[Array[Double]], Array[Array[Double]]) =
    trigCache.getOrElseUpdate(frameSize, {
      val bins = frameSize / 2
      val c = Array.tabulate(bins, frameSize)((k, i) =>
        math.cos(-2.0 * math.Pi * k * i / frameSize))
      val s = Array.tabulate(bins, frameSize)((k, i) =>
        math.sin(-2.0 * math.Pi * k * i / frameSize))
      (c, s)
    })

  /** Twiddle factors e^{-2 pi i k / n}, k < n/2, cached per FFT size. */
  private val fftTwiddleCache = scala.collection.concurrent.TrieMap
    .empty[Int, (Array[Double], Array[Double])]
  private def fftTwiddle(n: Int): (Array[Double], Array[Double]) =
    fftTwiddleCache.getOrElseUpdate(n, {
      val c = new Array[Double](n / 2)
      val s = new Array[Double](n / 2)
      var k = 0
      while (k < n / 2) {
        val a = -2.0 * math.Pi * k / n
        c(k) = math.cos(a); s(k) = math.sin(a)
        k += 1
      }
      (c, s)
    })

  /** In-place iterative radix-2 FFT (n a power of two). Replaces the
    * naive O(n^2) per-frame DFT with O(n log n): at the registered
    * 256-sample frames that is ~20x fewer flops, and the DFT was the
    * whole cost of landmark extraction (round-7 A/B in TIMEONE.md).
    * Magnitudes may differ from the naive loop by float rounding —
    * allowed: the audio oracle bakes peaks from THIS code, and the
    * rehearsal assertions (twin recovery, bounded time) are robust to
    * ulp-level spectral wiggle.
    */
  private[graft] def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) { // bit-reversal permutation
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    val (cs, sn) = fftTwiddle(n)
    var len = 2
    while (len <= n) {
      val half = len >> 1
      val step = n / len
      var base = 0
      while (base < n) {
        var k = 0
        while (k < half) {
          val wr = cs(k * step); val wi = sn(k * step)
          val a = base + k; val b = a + half
          val xr = re(b) * wr - im(b) * wi
          val xi = re(b) * wi + im(b) * wr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** The constellation alone: top `peaksPerFrame` DFT-magnitude bins
    * per frame. Factored out of [[landmarks]] unchanged — it is also
    * the oracle-generation seam: the DFT is the one floating-point
    * stage of the audio pipeline, so the oracle bakes THESE integer
    * peak bins as a VALUES table (a pure function of the payload) and
    * replays everything after them — landmark pairing, df-cap, offset
    * votes — relationally.
    */
  private[graft] def framePeaks(payload: Array[Byte], frameSize: Int,
      hop: Int, peaksPerFrame: Int): Array[Array[Int]] = {
    // only bins 1..frameSize/2-1 are eligible peaks (DC skipped), so
    // more requested peaks than that would leave the argmax empty
    require(peaksPerFrame < frameSize / 2,
      s"peaksPerFrame ($peaksPerFrame) must be < frameSize/2 " +
        s"(${frameSize / 2}): only frameSize/2 - 1 non-DC bins exist")
    val n = payload.length
    if (n < frameSize) return Array.empty
    val nFrames = (n - frameSize) / hop + 1
    val bins = frameSize / 2
    val pow2 = (frameSize & (frameSize - 1)) == 0
    val fr = if (pow2) new Array[Double](frameSize) else null
    val fi = if (pow2) new Array[Double](frameSize) else null
    // constellation: top peaks per frame
    val peaks = Array.ofDim[Int](nFrames, peaksPerFrame)
    var t = 0
    while (t < nFrames) {
      val off = t * hop
      val mag = new Array[Double](bins)
      if (pow2) { // FFT path (every registered frameSize)
        var i = 0
        while (i < frameSize) {
          fr(i) = (payload(off + i) & 0xFF) - 128.0
          fi(i) = 0.0
          i += 1
        }
        fftInPlace(fr, fi)
        var k = 1 // skip DC
        while (k < bins) {
          mag(k) = fr(k) * fr(k) + fi(k) * fi(k)
          k += 1
        }
      } else { // naive fallback for exotic frame sizes
        val (cosT, sinT) = trig(frameSize)
        var k = 1 // skip DC
        while (k < bins) {
          var re = 0.0
          var im = 0.0
          val ck = cosT(k)
          val sk = sinT(k)
          var i = 0
          while (i < frameSize) {
            val s = (payload(off + i) & 0xFF) - 128.0
            re += s * ck(i)
            im += s * sk(i)
            i += 1
          }
          mag(k) = re * re + im * im
          k += 1
        }
      }
      // top-p bins, ties -> lower bin (selection by repeated argmax:
      // p is 3, bins 32 — simplicity over asymptotics)
      var p = 0
      val taken = new Array[Boolean](bins)
      while (p < peaksPerFrame) {
        var best = -1
        var bestM = -1.0
        var b = 1
        while (b < bins) {
          if (!taken(b) && mag(b) > bestM) { bestM = mag(b); best = b }
          b += 1
        }
        taken(best) = true
        peaks(t)(p) = best
        p += 1
      }
      t += 1
    }
    peaks
  }

  private[graft] def landmarks(payload: Array[Byte], frameSize: Int,
      hop: Int, peaksPerFrame: Int, fanout: Int): Array[Long] = {
    val peaks = framePeaks(payload, frameSize, hop, peaksPerFrame)
    val nFrames = peaks.length
    // landmarks: anchor peak -> peaks in the next 1..fanout frames
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var t = 0
    while (t < nFrames) {
      var p1 = 0
      while (p1 < peaksPerFrame) {
        val f1 = peaks(t)(p1)
        var dt = 1
        while (dt <= fanout && t + dt < nFrames) {
          var p2 = 0
          while (p2 < peaksPerFrame) {
            val f2 = peaks(t + dt)(p2)
            // 10 bits per peak bin + 12 bits of dt (round 10 — the old
            // 8-bit f2 capped hash entropy at 2^17, BELOW the ~2^20+ a
            // real constellation carries, so 100x rehearsals saturated
            // df-caps on fixture collisions): frames up to 2048 samples
            // now hash injectively; packed stays < 2^52. The mapping
            // (f1, f2, dt) <-> hash is bijective either way, so match
            // results are identical for all pre-existing frame sizes.
            val hash = (f1.toLong << 22) | (f2.toLong << 12) | dt.toLong
            out += (hash << 20) | t.toLong
            p2 += 1
          }
          dt += 1
        }
        p1 += 1
      }
      t += 1
    }
    out.toArray
  }

  /** (id, hash, t) landmark table for a packed multimodal frame. */
  def landmarkTable(packed: DataFrame, frameSize: Int = 64, hop: Int = 32,
      peaksPerFrame: Int = 3, fanout: Int = 3): DataFrame = {
    // fail fast on the driver (the same require guards the UDF body,
    // but there it would only surface as an executor task failure)
    require(peaksPerFrame < frameSize / 2,
      s"peaksPerFrame ($peaksPerFrame) must be < frameSize/2 " +
        s"(${frameSize / 2}): only frameSize/2 - 1 non-DC bins exist")
    require(frameSize <= 2048,
      s"frameSize ($frameSize) must be <= 2048: peak bins pack in 10 bits")
    require(fanout < 4096, s"fanout ($fanout) must pack in 12 bits")
    val lm = udf((p: Array[Byte]) =>
      landmarks(p, frameSize, hop, peaksPerFrame, fanout))
    packed.select(col("id"), explode(lm(col("payload"))).as("packed"))
      .select(col("id"),
        shiftright(col("packed"), 20).as("hash"),
        (col("packed") % (1L << 20)).as("t"))
  }

  /** Offset-histogram match scores between all payload pairs sharing
    * landmarks: for each (ida < idb), the best vote count over relative
    * offsets plus that offset. `dfCap` drops degenerate hashes shared
    * by more than that many payloads before the pair join (the shingle
    * dfCap bargain — bounded candidate volume, near-identical audio
    * still matches on its rarer landmarks); `minVotes` floors reported
    * matches.
    */
  def matches(packed: DataFrame, minVotes: Long = 10, dfCap: Int = 50,
      frameSize: Int = 64, hop: Int = 32, peaksPerFrame: Int = 3,
      fanout: Int = 3): DataFrame = {
    // repartition BEFORE the landmark UDF: a small packed table often
    // arrives in one scan partition while the DFT fan-out behind it is
    // the expensive part (the "small input, huge generator" shape AQE
    // cannot see — the sim_knn_graph lesson); then checkpoint so the
    // rare-hash aggregation and the join sides extract landmarks ONCE
    val lt = landmarkTable(packed.repartition(col("id")),
        frameSize, hop, peaksPerFrame, fanout)
      .localCheckpoint(true)
    // barrier on the hash key: landmark extraction runs ONCE and both
    // self-join sides read the reused co-partitioned exchange
    val rare = lt.groupBy("hash")
      .agg(countDistinct("id").as("df"))
      .where(col("df") <= dfCap && col("df") >= 2)
    val ltr = lt.join(broadcast(rare.select("hash")), "hash")
      .repartition(col("hash"))
    val votes = ltr.as("a").join(ltr.as("b"),
        col("a.hash") === col("b.hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"),
        (col("b.t") - col("a.t")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    // best offset per pair: max_by keeps one deterministic winner
    // (votes desc, then smaller offset) without a per-pair sort
    votes.groupBy("ida", "idb")
      .agg(max(struct(col("votes").as("v"),
        (-col("offset")).as("negoff"))).as("w"))
      .select(col("ida"), col("idb"),
        col("w.v").as("votes"), (-col("w.negoff")).as("offset"))
      .where(col("votes") >= minVotes)
  }
}
