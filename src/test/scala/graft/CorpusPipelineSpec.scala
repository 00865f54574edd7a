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

  test("observed stage counters agree with the dedicated funnel pass") {
    val (prepared, metrics) = CorpusPipeline.prepareObserved(docs)
    val nOut = prepared.count() // the caller's own action fires the obs
    val observed = metrics()
    val funnel = CorpusPipeline.funnel(docs)
      .orderBy("stage").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(observed == funnel, s"observed=$observed funnel=$funnel")
    assert(observed("5_near_dedup") == nOut)
  }

  test("funnelObserved is row-for-row identical to the dedicated funnel pass") {
    val a = CorpusPipeline.funnelObserved(docs).orderBy("stage").collect().toSeq
    val b = CorpusPipeline.funnel(docs).orderBy("stage").collect().toSeq
    assert(a == b, s"observed=$a dedicated=$b")
  }

  test("prepared corpus is english-only and free of near-dups") {
    val prepared = CorpusPipeline.prepare(docs)
    assert(prepared.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("en"))
    val pairs = graft.operators.Dedup.minhashLshPairs(
      prepared, "doc_id", "text", 0.5)
    assert(pairs.count() == 0, "near-dup pairs survived preparation")
  }

  test("token budget: distributed prefix sum equals driver-side cumsum") {
    // small bucket width forces many buckets + offset joins
    val out = CorpusPipeline.tokenBudgetSample(docs, budget = 3000L,
        bucketWidth = 7L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // reference: naive cumsum over the same per-doc counts
    val toks = docs.select(col("doc_id"))
      .orderBy("doc_id").collect().map(_.getLong(0))
    val counts = out.map(t => t._1 -> t._2).toMap
    var cum = 0L
    val expectIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var stop = false
    while (i < toks.length && !stop) {
      // recompute count only for ids the sample kept; once an id is
      // missing the budget must have been crossed
      counts.get(toks(i)) match {
        case Some(n) => cum += n; expectIds += toks(i)
        case None => stop = true
      }
      i += 1
    }
    assert(out.map(_._1).toSeq == expectIds.toSeq)
    assert(out.last._3 == cum && cum <= 3000L)
    // cum_tokens is strictly increasing and consistent with n_tokens
    out.sliding(2).foreach {
      case Array((_, _, c1), (_, n2, c2)) => assert(c2 == c1 + n2)
      case _ => ()
    }
  }

  test("per-source budgets: each source's running total respects its own cap") {
    val budgets = Map("src0" -> 900L, "src1" -> 400L)
    val out = CorpusPipeline.tokenBudgetPerSource(docs, budgets,
        defaultBudget = 200L, bucketWidth = 7L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, rows) =>
      val cap = budgets.getOrElse(src, 200L)
      assert(rows.forall(_._4 <= cap), s"$src exceeded $cap")
      // cum is a per-source prefix sum in doc_id order
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, c) =>
        cum += n; assert(c == cum, s"$src cum drift")
      }
    }
    // at least two different sources must actually appear
    assert(out.map(_._2).distinct.length >= 2)
  }

  test("sequence packing: offsets are an exact exclusive prefix sum and packs are contiguous") {
    val out = CorpusPipeline.packSequences(docs, seqLen = 256L,
        bucketWidth = 7L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    var cum = 0L
    out.foreach { case (_, n, start, pack) =>
      assert(start == cum, s"offset drift at start=$start expected=$cum")
      assert(pack == start / 256L)
      cum += n
    }
    // pack ids never decrease and never skip more than a doc can span
    out.sliding(2).foreach {
      case Array((_, n1, _, p1), (_, _, _, p2)) =>
        assert(p2 >= p1 && p2 <= p1 + n1 / 256L + 1)
      case _ => ()
    }
  }

  test("context windows: full coverage, stride spacing, bounded width") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 tokens
      (2L, "a b c"),                                  // shorter than one window
      (3L, (1 to 16).map(i => s"x$i").mkString(" "))) // one full + tail window
      .toDF("doc_id", "text")
    val w = CorpusPipeline.contextWindows(d, winSize = 16, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // doc 1: starts 0, 8, 16 -> widths 16, 12, 4
    val d1 = w.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 16L), (1L, 12L), (2L, 4L)))
    // consecutive windows overlap by winSize - stride tokens
    assert(d1(0)._4.split(" ").drop(8).toSeq ===
      d1(1)._4.split(" ").take(8).toSeq)
    // every token of every doc appears in at least one window
    val covered = w.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 20).map(i => s"w$i").toSet)
    // short doc: a single truncated window, exact-width doc: one window
    assert(w.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 3L)))
    // 16 tokens: the full window plus the stride-16 tail window
    assert(w.filter(_._1 == 3L).map(x => (x._2, x._3)).sorted.toSeq ===
      Seq((0L, 16L), (1L, 8L)))
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
