package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val packed =
    Multimodal.packDocuments(Tables(spark, sfDir, "documents"))

  test("packed payload roundtrips the text bytes") {
    val row = packed
      .join(Tables(spark, sfDir, "documents"),
        col("id") === col("doc_id"))
      .select(decode(col("payload"), "UTF-8").as("roundtrip"), col("text"))
      .limit(20).collect()
    row.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("dhash bucketCap: generous cap is identity, tight cap a subset") {
    val uncapped = Multimodal.dhashPairs(packed, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val generous = Multimodal.dhashPairs(packed, maxHamming = 6,
        bucketCap = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == uncapped, "a cap above every bucket must be a no-op")
    val tight = Multimodal.dhashPairs(packed, maxHamming = 6, bucketCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(uncapped),
      "capping may only DROP candidates, never invent pairs")
  }

  test("meta matches payload sizes") {
    val bad = packed
      .where(col("meta.n_bytes") =!= octet_length(col("payload")))
      .count()
    assert(bad == 0)
  }

  test("feature extraction is deterministic and content-sensitive") {
    val f1 = Multimodal.extractFeatures(packed).collect()
      .map(r => r.id -> r.checksum).toMap
    val f2 = Multimodal.extractFeatures(packed).collect()
      .map(r => r.id -> r.checksum).toMap
    assert(f1 == f2)
    assert(f1.values.toSet.size > 1) // different payloads -> different sums
  }

  test("features histogram is a probability-ish vector") {
    Multimodal.extractFeatures(packed).collect().take(50).foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3)
    }
  }

  test("frame sampling produces strided offsets") {
    val frames = Multimodal.sampleFrames(packed, frameBytes = 64, stride = 50)
    val one = frames.where(col("id") === 0).orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    one.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i && r.getInt(2) == i * 50)
    }
  }

  test("resize is fixed-length nearest-neighbor sampling") {
    import spark.implicits._
    val in = Seq(
      (1L, "abcdefgh".getBytes("UTF-8")),
      (2L, "xy".getBytes("UTF-8")),
      (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val out = Multimodal.resizePayload(in, outLen = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // indices floor(i*8/4) = 0,2,4,6 -> a,c,e,g
    assert(new String(out(1L), "UTF-8") === "aceg")
    // upsampling repeats: floor(i*2/4) = 0,0,1,1 -> x,x,y,y
    assert(new String(out(2L), "UTF-8") === "xxyy")
    assert(out(3L).isEmpty) // empty payload stays empty, no crash
  }

  test("batched inference: bounded batches, every row scored exactly once") {
    val n = packed.count()
    val out = Multimodal.batchedInference(packed.repartition(3), batchSize = 32)
      .toDF().cache()
    assert(out.count() === n)
    assert(out.select(countDistinct(col("id"))).collect()(0).getLong(0) === n)
    val sizes = out.select("batch_size").distinct()
      .collect().map(_.getInt(0))
    assert(sizes.max <= 32, s"batch over limit: ${sizes.toSeq}")
    assert(sizes.contains(32), "full batches must occur at this row count")
    // scores match the row-local stub definition
    val bad = out.join(packed.select(col("id"),
        aggregate(transform(split(decode(col("payload"), "UTF-8"), ""),
          c => ascii(c).cast("long")), lit(0L), (a, b) => a + b).as("bs")),
      "id")
      .where(col("score") =!= (col("bs") % 1000).cast("double") / 10.0)
    assert(bad.count() === 0)
  }

  test("phash: low-frequency DCT block matches the direct definition") {
    // separable fast path vs the O(N^2) per-coefficient direct sum
    val payload = Array.tabulate(977)(i => ((i * 131 + 17) % 251).toByte)
    val N = 32
    val n = payload.length
    val g = Array.tabulate(N * N) { cell =>
      val from = (cell.toLong * n / (N * N)).toInt
      val to = math.max(((cell + 1).toLong * n / (N * N)).toInt, from + 1)
      val xs = (from until math.min(to, n)).map(i => (payload(i) & 0xFF).toDouble)
      xs.sum / math.max(to - from, 1)
    }
    def alpha(k: Int) = if (k == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)
    def direct(l: Int, k: Int): Double = {
      var s = 0.0
      for (r <- 0 until N; i <- 0 until N)
        s += g(r * N + i) *
          math.cos(math.Pi * (2 * i + 1) * k / (2.0 * N)) *
          math.cos(math.Pi * (2 * r + 1) * l / (2.0 * N))
      alpha(l) * alpha(k) * s
    }
    // rebuild the hash from direct coefficients and compare
    val co = Array.tabulate(8, 8)((l, k) => direct(l, k))
    val vals = (for (a <- 0 until 8; b <- 0 until 8 if a != 0 || b != 0)
      yield co(a)(b)).toArray.sorted
    val med = vals(31)
    var want = 0L
    for (a <- 0 until 8; b <- 0 until 8)
      want = (want << 1) | (if (co(a)(b) > med) 1L else 0L)
    assert(Multimodal.phash64(payload) == want)
  }

  test("phash: identical payloads collide; sparse bit flips stay close") {
    val base = ("the quick brown fox jumps over the lazy dog " * 20).getBytes
    val corrupted = {
      val b = base.clone()
      var i = 7
      while (i < b.length) { b(i) = (b(i) ^ 1).toByte; i += 97 }
      b
    }
    val different =
      ("completely unrelated bytes 0123456789 " * 25).getBytes
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h0 = Multimodal.phash64(base)
    assert(Multimodal.phash64(base) == h0)
    // the median split sets ~half the 64 bits for any non-degenerate input
    assert(java.lang.Long.bitCount(h0) >= 28 &&
      java.lang.Long.bitCount(h0) <= 36, s"popcount=${java.lang.Long.bitCount(h0)}")
    assert(ham(h0, Multimodal.phash64(corrupted)) <= 3,
      s"sparse flips drifted: ${ham(h0, Multimodal.phash64(corrupted))}")
    assert(ham(h0, Multimodal.phash64(different)) > 3,
      "unrelated payloads too close")
  }

  test("dhash: identical payloads collide, near-identical stay close") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 20).getBytes
    val nearDup = {
      val b = base.clone(); b(5) = 'X'.toByte; b } // one-byte edit
    val different =
      ("completely unrelated bytes 0123456789 " * 25).getBytes
    val h0 = Multimodal.dhash64(base)
    assert(Multimodal.dhash64(base) == h0) // deterministic
    val hNear = Multimodal.dhash64(nearDup)
    val hFar = Multimodal.dhash64(different)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h0, hNear) <= 6, s"near edit drifted: ${ham(h0, hNear)}")
    assert(ham(h0, hFar) > 6, s"unrelated payloads too close: ${ham(h0, hFar)}")

    val pairs = Multimodal.dhashPairs(
      Seq((1L, base), (2L, nearDup), (3L, different))
        .toDF("id", "payload"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dhash pairs recover byte-corrupted copies planted in a corpus") {
    // dHash's invariance is to ALIGNED perturbations (the image
    // near-dup case: re-encode, slight noise) — token-level text edits
    // are a different geometry and belong to the shingle/minhash
    // family. So the planted twins here are byte-level corruptions.
    import spark.implicits._
    val originals = packed.select("id", "payload")
      .where(col("id") < 30).as[(Long, Array[Byte])].collect()
    assert(originals.length == 30)
    val twins = originals.map { case (id, p) =>
      val b = p.clone()
      var i = 7
      while (i < b.length) { b(i) = (b(i) ^ 1).toByte; i += 97 }
      (id + 1000000L, b)
    }
    val corpus = (originals ++ twins).toIndexedSeq.toDF("id", "payload")
    val found = Multimodal.dhashPairs(corpus, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = originals.map { case (id, _) => (id, id + 1000000L) }.toSet
    val recall = (expected intersect found).size.toDouble / expected.size
    info(s"dhash recall of corrupted twins = $recall")
    assert(recall >= 0.8, s"dhash missed corrupted twins: $recall")
  }
}
