package graft

import org.apache.spark.sql.functions._

import graft.operators.ChunkDedup
import graft.text.TextOps

/** Invariants for sub-document chunk dedup (the DuckDB oracle pins the
  * exact output; these pin the semantics that make it a dedup).
  */
class ChunkDedupSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")
  private lazy val out =
    ChunkDedup.dedupChunks(docs, "doc_id", "text", unit = 10).cache()

  test("documents with no removed chunks reassemble to the tokenized original") {
    val expected = docs.select(col("doc_id"),
      array_join(TextOps.tokens(col("text")), " ").as("norm_text"))
    val full = out.where(col("n_kept") === col("n_chunks"))
      .join(expected, "doc_id")
    assert(full.count() > 0, "corpus should contain fully-unique docs")
    assert(full.where(col("dedup_text") =!= col("norm_text")).count() === 0)
  }

  test("every distinct chunk text survives exactly once corpus-wide") {
    val totalKept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctChunks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(posexplode(transform(
        sequence(lit(0),
          floor((size(col("toks")) + lit(9)) / lit(10)).cast("int") - lit(1)),
        i => array_join(slice(col("toks"), i * 10 + 1, lit(10)), " "))))
      .select(countDistinct(col("col"))).collect()(0).getLong(0)
    assert(totalKept === distinctChunks)
  }

  test("matches a driver-side reference on seeded random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    // heavy chunk-level duplication: docs assembled from a tiny pool of
    // 10-token blocks
    val blocks = Vector.fill(6)(Vector.fill(10)(vocab(rnd.nextInt(4))))
    val docs = (0L until 40L).map { id =>
      val nb = 1 + rnd.nextInt(4)
      (id, Vector.fill(nb)(blocks(rnd.nextInt(6))).flatten.mkString(" "))
    }
    val out = ChunkDedup.dedupChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", unit = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    // reference: first occurrence by (doc, idx) wins
    val seen = scala.collection.mutable.Set.empty[String]
    docs.foreach { case (id, text) =>
      val chunks = text.split(" ").grouped(10).map(_.mkString(" ")).toVector
      val kept = chunks.filter(c => seen.add(c))
      val (nc, nk, dt) = out(id)
      assert(nc === chunks.length && nk === kept.length &&
        dt === kept.mkString(" "), s"doc $id")
    }
  }

  test("kept never exceeds total and every doc row is present") {
    assert(out.where(col("n_kept") > col("n_chunks")).count() === 0)
    assert(out.count() === docs.where(length(trim(col("text"))) > 0).count())
  }
}
