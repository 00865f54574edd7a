package graft

import graft.operators.IvfAnn

/** Pins for the shuffle-partitioned ANN join (kNN graph). The
  * registered query probes all lists and is oracle-checked; these pin
  * the two properties the oracle can't: all-lists probing IS exact
  * (machinery equivalence against the broadcast top-k path on every
  * row), and pruned probing keeps usable recall while touching only
  * nprobe/nlist of the corpus per query.
  */
class IvfAnnSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  private def collectGraph(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("all-lists probe equals the exact brute-force kNN graph") {
    val ivf = collectGraph(
      IvfAnn.knnJoin(emb, emb, k = 5, nlist = 4, nprobe = 4))
    val brute = collectGraph(
      graft.operators.Similarity.cosineTopKAgg(emb, emb, k = 5))
    assert(ivf == brute,
      s"diff: ${(ivf -- brute).take(3)} / ${(brute -- ivf).take(3)}")
  }

  test("pruned probe keeps recall while reading a fraction of the corpus") {
    val exact = collectGraph(
        graft.operators.Similarity.cosineTopKAgg(emb, emb, k = 5))
      .map(t => (t._1, t._2))
    val pruned = collectGraph(
        IvfAnn.knnJoin(emb, emb, k = 5, nlist = 8, nprobe = 2))
      .map(t => (t._1, t._2))
    val recall = exact.intersect(pruned).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall@5 = $recall with nprobe/nlist = 2/8")
  }
}
