package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("funnel is monotone and final stage matches prepare()") {
    val funnel = CorpusPipeline.funnel(docs)
      .orderBy("stage").collect()
    val counts = funnel.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${counts.toSeq}")
    assert(counts.last == CorpusPipeline.prepare(docs).count())
    assert(funnel.last.getLong(2) > 0) // token budget reported
  }

  test("prepared corpus is english-only and free of near-dups") {
    val prepared = CorpusPipeline.prepare(docs)
    assert(prepared.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("en"))
    val pairs = graft.operators.Dedup.minhashLshPairs(
      prepared, "doc_id", "text", 0.5)
    assert(pairs.count() == 0, "near-dup pairs survived preparation")
  }

  test("exact dedup keeps the lowest doc_id per text") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma"), (5L, "alpha beta gamma"),
      (3L, "unique text here")).toDF("doc_id", "text")
    val out = CorpusPipeline.exactDeduped(d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }
}
