package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 10)

  test("vector ops match driver-side double math") {
    val row = emb.where(col("vec_id") === 0)
      .select(
        VectorOps.dot(col("embedding"), col("embedding")).as("d"),
        VectorOps.norm(col("embedding")).as("n"))
      .collect()(0)
    val v = emb.where(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble)
    val expected = v.foldLeft(0.0)((acc, x) => acc + x * x)
    assert(row.getDouble(0) == expected)
    assert(row.getDouble(1) == math.sqrt(expected))
  }

  test("entry guard: int ids are normalized, wrong types fail fast") {
    // INT vec_id works (normalized to long before the typed collect)
    val intIds = emb.withColumn("vec_id", col("vec_id").cast("int"))
    val rows = Similarity.cosineTopK(intIds,
      intIds.where(col("vec_id") < 3), 2).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) < 3))
    // string ids / double-array embeddings: readable failure at entry,
    // not a ClassCastException inside a task
    val badId = emb.withColumn("vec_id", col("vec_id").cast("string"))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(badId, badId, 2)
    }
    assert(e1.getMessage.contains("vec_id"))
    val badEmb = emb.withColumn("embedding",
      col("embedding").cast("array<double>"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.ScalarQuant.sqTopK(badEmb, badEmb, 2)
    }
    assert(e2.getMessage.contains("ARRAY<FLOAT>"))
  }

  test("brute-force topk: k per query, self excluded, descending sims") {
    val rows = Similarity.cosineTopK(emb, queries, 5).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    byQ.values.foreach { g =>
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hard negatives: labels always differ from the query's") {
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(emb, queries, 5).collect()
    assert(rows.groupBy(_.getLong(0)).size == 10)
    rows.foreach { r =>
      assert(labels(r.getLong(1)) != labels(r.getLong(0)),
        s"pick ${r.getLong(1)} shares the query label")
    }
  }

  test("mmr: first pick is top-1 relevance, a planted near-dup is demoted") {
    import spark.implicits._
    // query q looks like the x-axis; c1/c2 are nearly identical high-rel
    // vectors, c3 is distinct but still relevant. Plain top-2 = {c1, c2};
    // MMR (lambda .5) must swap the redundant c2 for c3.
    val corpus = Seq(
      (1L, Array(1.0f, 0.02f, 0.0f)),   // c1: rel ~1
      (2L, Array(1.0f, 0.03f, 0.0f)),   // c2: near-dup of c1
      (3L, Array(0.8f, 0.0f, 0.6f)),    // c3: rel .8, diverse
      (4L, Array(0.0f, 1.0f, 0.0f))     // far
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(corpus, q, k = 2, pool = 4, lambda = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(4)))
    assert(picks.toSeq == Seq((1L, 1L), (3L, 2L)),
      s"expected diverse pick order (1, 3), got ${picks.toSeq}")
    // full-size run: picks are distinct, pick 1 = cosine rank 1
    val full = Similarity.mmrTopK(emb, queries, k = 5, pool = 20)
    val byQ = full.collect().groupBy(_.getLong(0))
    val top1 = Similarity.cosineTopK(emb, queries, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (qid, g) =>
      assert(g.map(_.getLong(1)).distinct.length == g.length)
      assert(g.minBy(_.getLong(4)).getLong(1) == top1(qid),
        s"qid $qid: first MMR pick must be the most relevant")
    }
  }

  test("random negatives: exactly k per anchor, different label, stable") {
    import graft.operators.NegativeSample
    val corpus = emb.select("vec_id", "label")
    val anchors = emb.where(col("vec_id") < 20).select("vec_id", "label")
    val a = NegativeSample.randomNegatives(corpus, anchors, k = 4).collect()
    val b = NegativeSample.randomNegatives(corpus, anchors, k = 4).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "must be run-stable")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byA = a.groupBy(_.getLong(0))
    assert(byA.size == 20 && byA.values.forall(_.length == 4))
    a.foreach { r =>
      assert(r.getLong(1) != r.getLong(0))
      assert(labels(r.getLong(1)) != labels(r.getLong(0)),
        s"negative ${r.getLong(1)} shares anchor ${r.getLong(0)}'s label")
    }
  }

  test("mmr at lambda=1 degenerates to plain cosine top-k") {
    val plain = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
    val mmr = Similarity.mmrTopK(emb, queries, k = 5, pool = 20, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(1)))
    assert(mmr.sorted.toSeq == plain.sorted.toSeq)
  }

  test("knn classify: pred is a neighbor label with a correct vote count") {
    val unl = emb.where(col("vec_id") % 5 === 0)
    val lab = emb.where(col("vec_id") % 5 =!= 0)
    val labels = lab.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val knn = Similarity.cosineTopK(lab, unl, 5).collect()
      .groupBy(_.getLong(0))
      .map { case (q, g) => q -> g.map(r => labels(r.getLong(1))) }
    val preds = Similarity.knnClassify(lab,
      unl.select("vec_id", "embedding"), 5).collect()
    assert(preds.length == knn.size)
    preds.foreach { r =>
      val (q, pred, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val votes = knn(q).groupBy(identity).view.mapValues(_.length)
      assert(votes(pred) == n, s"qid $q: vote count mismatch")
      assert(votes.values.max == n, s"qid $q: pred must be a modal label")
    }
  }

  test("lsh ann recall vs brute force is useful and results are a subset") {
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLshTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }

  test("ivf ann recall vs brute force is useful") {
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.IvfAnn.ivfTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }

  test("pq ann recall vs brute force is useful and codes are m bytes") {
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.PqAnn.pqTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall") // measured 0.84 at rerankFactor=12
    assert(recall >= 0.5, s"recall collapsed: $recall")
    // the scan-side representation really is m bytes per vector
    val books = graft.operators.PqAnn.trainCodebooks(emb)
    val codes = graft.operators.PqAnn.encode(emb, books)
    val lens = codes.select(length(col("code"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(8), s"code widths: $lens")
  }

  test("int8 scalar quantization is near-lossless for top-k") {
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.ScalarQuant.sqTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"SQ8 recall@5 = $recall")
    assert(recall >= 0.9, s"int8 rounding should be near-lossless: $recall")
    // reconstruction error bound: quantized norm within 1% of true norm
    val withTrue = graft.operators.ScalarQuant.encode(emb)
      .join(emb, "vec_id")
      .select(col("approx_nrm"),
        graft.functions.VectorOps.norm(col("embedding")).as("nrm"))
      .collect()
    withTrue.foreach { r =>
      val (a, t) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(a - t) / t < 0.01, s"norm drift: $a vs $t")
    }
  }

  test("persisted ivf index reproduces the inline path and prunes partitions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    graft.operators.IvfAnn.writeIndex(emb, dir, nlist = 16)
    // layout: one partition dir per inverted list
    val listDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.getName.startsWith("list_id="))
    assert(listDirs.length > 1)
    val fromIndex = graft.operators.IvfAnn
      .queryIndex(spark, dir, queries, k = 5)
      .collect().map(_.toSeq)
    val inline = graft.operators.IvfAnn.ivfTopK(emb, queries, k = 5)
      .collect().map(_.toSeq)
    // same centroids (same seed + sample) -> identical results
    assert(fromIndex.toSeq === inline.toSeq)
  }

  test("ivf index append makes new vectors findable without a rebuild") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString
    val base = emb.where(col("vec_id") < 400)
    val late = emb.where(col("vec_id") >= 400)
    graft.operators.IvfAnn.writeIndex(base, dir, nlist = 16)

    val before = graft.operators.IvfAnn
      .queryIndex(spark, dir, queries, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!before.exists(_ >= 400), "late vectors cannot be findable yet")

    graft.operators.IvfAnn.appendToIndex(late, dir)
    // full-corpus index built from the SAME centroids gives the target
    val assigned = spark.read.parquet(s"$dir/assigned")
    assert(assigned.count() == emb.count())
    val after = graft.operators.IvfAnn
      .queryIndex(spark, dir, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // appended vectors participate in results (the corpus has neighbors
    // in the late range for at least one query at these thresholds)
    assert(after != before.map(v => (0L, v)), "sanity")
    val lateHits = after.count(_._2 >= 400)
    assert(lateHits > 0, "no appended vector ever surfaced in top-k")
  }

  test("cosine dup pairs are symmetric-free and above threshold") {
    val rows = graft.queries.SimilarityQueries.cosineDupPairs(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
