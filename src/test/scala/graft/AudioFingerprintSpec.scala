package graft

import org.apache.spark.sql.functions._

import graft.operators.AudioFingerprint

/** Pins the constellation-landmark contract (Wang 2003): determinism,
  * the time-shift robustness that is the algorithm's reason to exist
  * (global hashes cannot survive a prefix splice; landmarks match at
  * a consistent relative offset), and vote concentration — a true
  * match's votes pile at ONE offset while unrelated payloads never
  * reach the floor.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic "audio" with time-VARYING spectral content (a blockwise
    * chirp): constant-byte or periodic fillers give every frame the
    * same spectrum, which degenerates the constellation — real audio
    * does not look like that, and neither should the fixture.
    */
  private def bytes(seed: Int, n: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val freqs = Array.fill((n + 63) / 64)(1 + rnd.nextInt(20))
    Array.tabulate(n) { i =>
      val f = freqs(i / 64)
      (127 * math.cos(2 * math.Pi * f * (i % 64) / 64.0)).toByte
    }
  }

  test("FFT spectra agree with the naive DFT (fallback-path parity)") {
    // the radix-2 FFT (power-of-two frames, the production path) and
    // the naive DFT (exotic-size fallback) must describe the SAME
    // spectrum: compare magnitudes of a full frame computed both ways.
    // Ulp-level float differences are expected; anything beyond 1e-6
    // relative means one of the two transforms is wrong.
    val n = 256
    val p = bytes(7, n)
    val re = Array.tabulate(n)(i => ((p(i) & 0xFF) - 128).toDouble)
    val im = new Array[Double](n)
    AudioFingerprint.fftInPlace(re, im)
    var k = 1
    while (k < n / 2) {
      var dr = 0.0; var di = 0.0
      var i = 0
      while (i < n) {
        val s = ((p(i) & 0xFF) - 128).toDouble
        val a = -2.0 * math.Pi * k * i / n
        dr += s * math.cos(a); di += s * math.sin(a)
        i += 1
      }
      val fftMag = math.sqrt(re(k) * re(k) + im(k) * im(k))
      val dftMag = math.sqrt(dr * dr + di * di)
      assert(math.abs(fftMag - dftMag) <= 1e-6 * math.max(dftMag, 1.0),
        s"bin $k: fft $fftMag vs dft $dftMag")
      k += 1
    }
    // and the constellation itself agrees: a 255-sample frame forces
    // the naive path; its peaks on the shared prefix content are the
    // same algorithm, different transform — spot-check both run clean
    val pk256 = AudioFingerprint.framePeaks(p, 256, 128, 3)
    val pk255 = AudioFingerprint.framePeaks(p, 255, 128, 3)
    assert(pk256.nonEmpty && pk255.nonEmpty)
  }

  test("known sinusoids peak at their analytic bins (independent spectral fixture)") {
    // the r7 advisor note: the audio ORACLE bakes peak bins produced
    // by framePeaks itself, so the DFT/peak stage is self-referential
    // there. This fixture is the independent anchor: a byte payload
    // sampling A1*cos(2*pi*k1*i/N) + A2*cos(2*pi*k2*i/N) has an
    // ANALYTIC spectrum — all energy at bins k1 and k2, ordered by
    // amplitude — so the expected peaks come from Fourier theory, not
    // from the code under test.
    val frame = 64
    val (k1, a1) = (7, 80.0)  // dominant tone
    val (k2, a2) = (19, 40.0) // secondary tone
    val payload = Array.tabulate(frame * 4) { i =>
      val s = a1 * math.cos(2 * math.Pi * k1 * i / frame) +
        a2 * math.cos(2 * math.Pi * k2 * i / frame)
      (128 + math.round(s)).toByte // stub decode inverts this exactly
    }
    // hop == frame: every frame sees an integer number of periods of
    // both tones, so leakage is only the byte-rounding noise floor
    val peaks = AudioFingerprint.framePeaks(payload, frame, frame, 3)
    assert(peaks.length == 4)
    peaks.zipWithIndex.foreach { case (ps, t) =>
      assert(ps(0) == k1, s"frame $t: dominant peak ${ps(0)}, expected bin $k1")
      assert(ps(1) == k2, s"frame $t: second peak ${ps(1)}, expected bin $k2")
    }
    // single pure tone: exactly one spectral line
    val pure = Array.tabulate(frame * 2) { i =>
      (128 + math.round(100.0 * math.cos(2 * math.Pi * 11 * i / frame))).toByte
    }
    AudioFingerprint.framePeaks(pure, frame, frame, 1)
      .zipWithIndex.foreach { case (ps, t) =>
        assert(ps(0) == 11, s"frame $t: pure tone peaked at ${ps(0)}, expected 11")
      }
  }

  test("landmarks are deterministic and well-formed") {
    val p = bytes(1, 800)
    val a = AudioFingerprint.landmarks(p, 64, 32, 3, 3)
    val b = AudioFingerprint.landmarks(p, 64, 32, 3, 3)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    a.foreach { packed =>
      val hash = packed >> 20
      val t = packed & ((1L << 20) - 1)
      val dt = hash & 0xFFF // low 12 bits since the round-10 widening
      assert(dt >= 1 && dt <= 3)
      assert(t >= 0 && t < 800 / 32)
    }
    // payloads shorter than one frame produce nothing
    assert(AudioFingerprint.landmarks(bytes(1, 63), 64, 32, 3, 3).isEmpty)
  }

  test("a time-shifted copy matches at its true offset; unrelated do not") {
    val base = bytes(2, 1600)
    val pad = 96 // exactly 3 hops, so frames realign
    val shifted = bytes(9, pad) ++ base
    val unrelated = bytes(5, 1600)
    val df = Seq((1L, base), (2L, shifted), (3L, unrelated))
      .toDF("id", "payload")
    val m = AudioFingerprint.matches(df, minVotes = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(m.contains((1L, 2L)), s"shifted copy not recovered: $m")
    val (votes, offset) = m((1L, 2L))
    assert(offset == pad / 32, s"wrong offset: $offset")
    assert(votes >= 100)
    assert(!m.contains((1L, 3L)) && !m.contains((2L, 3L)),
      s"unrelated payloads matched: $m")
  }

  test("matches are partition-layout independent") {
    import spark.implicits._
    val df = Seq((1L, bytes(2, 1600)), (2L, bytes(9, 96) ++ bytes(2, 1600)),
      (3L, bytes(5, 1600)), (4L, bytes(6, 1600)))
      .toDF("id", "payload")
    def res(parts: Int) = AudioFingerprint.matches(
        df.repartition(parts), minVotes = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(res(1) == res(7))
  }

  test("peaksPerFrame beyond the non-DC bin count is rejected up front") {
    import spark.implicits._
    val df = Seq((1L, bytes(2, 64))).toDF("id", "payload")
    // frameSize=6 -> bins=3, eligible non-DC bins = 2: asking for 3
    // peaks used to AIOOBE deep in the selection loop; now a driver-
    // side require rejects it before any job runs
    val e = intercept[IllegalArgumentException] {
      AudioFingerprint.landmarkTable(df, frameSize = 6, hop = 3,
        peaksPerFrame = 3)
    }
    assert(e.getMessage.contains("peaksPerFrame"))
    intercept[IllegalArgumentException] {
      AudioFingerprint.landmarks(bytes(2, 64), 6, 3, 3, 3)
    }
    // the boundary case (peaksPerFrame == bins - 1) stays legal
    assert(AudioFingerprint.landmarks(bytes(2, 64), 6, 3, 2, 3) != null)
  }

  test("votes concentrate at one offset for a true match") {
    val base = bytes(3, 1600)
    val shifted = bytes(4, 64) ++ base
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "payload")
    val lt = AudioFingerprint.landmarkTable(df)
    val votes = lt.as("a").join(lt.as("b"),
        col("a.hash") === col("b.hash") && col("a.id") < col("b.id"))
      .groupBy((col("b.t") - col("a.t")).as("offset"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = votes.maxBy(_._2)
    assert(best._1 == 2L, s"peak offset ${best._1} != 2")
    // the true offset holds a clear plurality
    assert(best._2 * 2 > votes.values.sum,
      s"votes not concentrated: $votes")
  }
}
