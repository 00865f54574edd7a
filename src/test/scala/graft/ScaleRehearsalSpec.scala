package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale rehearsal for the broadcast-hint defaults (r3 verdict task 5):
  * the explicit `broadcast()` hints on the Jaccard verify joins were
  * justified by sf0.1 measurements only. Here the shingle table is
  * pushed to 10x the correctness corpus (5 000 docs, heavy cross-
  * replica near-dup structure) and the hint is turned OFF
  * (`verifyBroadcast=false` — the documented escape hatch for when the
  * shingle table exceeds broadcast memory): every path must produce
  * IDENTICAL pairs to the hinted run and finish in bounded time on the
  * shuffled plan. AQE is free to re-broadcast from runtime stats —
  * that is the mechanism that would actually pick the join at 100 TB,
  * the point is that nothing in the PLAN forces corpus-sized state
  * through a broadcast.
  *
  * Measured numbers live in docs/SCALING.md ("Broadcast-off rehearsal").
  */
class ScaleRehearsalSpec extends SparkSpec {

  // 10x the sf0.01 corpus: replicas keep near-dup structure (slightly
  // perturbed text) and unique ids in disjoint ranges
  private lazy val docs10: DataFrame = {
    val base = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val reps = (0 until 10).map { r =>
      base.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }
    reps.reduce(_ unionByName _).localCheckpoint(true)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("jaccardPairs without the verify broadcast: same pairs, bounded") {
    val (hinted, tHint) = timed {
      Dedup.jaccardPairs(docs10, "doc_id", "text", threshold = 0.2,
          dfCap = 50, minShared = 2, verifyBroadcast = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (shuffled, tShuf) = timed {
      Dedup.jaccardPairs(docs10, "doc_id", "text", threshold = 0.2,
          dfCap = 50, minShared = 2, verifyBroadcast = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    info(f"10x corpus: hinted $tHint%.1fs, shuffled $tShuf%.1fs, " +
      s"${shuffled.size} pairs")
    assert(shuffled == hinted,
      "the hint must be a pure strategy choice, never a result change")
    assert(shuffled.nonEmpty, "cross-replica near-dups must be found")
    assert(tShuf < 180.0, f"shuffled verify took $tShuf%.1fs — unbounded?")
  }

  test("fuzzyJoin at 10x: probe-side-only broadcast stays bounded") {
    val probes = docs10.where(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id").as("probe_id"),
        regexp_replace(col("text"), "^(\\S+\\s+){5}", "").as("ptext"))
    val (rows, t) = timed {
      Dedup.fuzzyJoin(docs10, "doc_id", "text",
        probes, "probe_id", "ptext", threshold = 0.5).count()
    }
    info(f"10x fuzzy join: $rows resolved pairs in $t%.1fs")
    assert(rows > 0)
    assert(t < 180.0, f"fuzzy join took $t%.1fs — unbounded?")
  }

  test("knnJoin at 10x vectors: pruned probe stays bounded, recall holds") {
    import graft.operators.IvfAnn
    // 10x the sf0.01 embedding table: perturbed replicas in disjoint
    // id ranges (same construction as docs10 — near-neighbor structure
    // survives so recall is measurable, cardinality is 10x)
    val base = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val emb10 = (0 until 10).map { r =>
      base.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> " +
          s"x + float(0.001) * float($r) * float(if(i % 2 = 0, 1, -1)))")
          .cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    val n = emb10.count()
    val (rows, t) = timed {
      IvfAnn.knnJoin(emb10, emb10, k = 5, nlist = 64, nprobe = 8,
        sampleMod = 10).count()
    }
    info(f"10x knn graph: $n vectors, $rows edges in $t%.1fs " +
      "(nprobe/nlist = 8/64 — candidates ~1/8 of brute force)")
    assert(rows == n * 5, "every vector must get k neighbors")
    assert(t < 180.0, f"pruned knn graph took $t%.1fs — unbounded?")
    // replicas of the same base vector are near-identical: the pruned
    // graph must still surface replica neighbors for most queries
    val sameBase = IvfAnn.knnJoin(emb10, emb10, k = 5, nlist = 64,
        nprobe = 8, sampleMod = 10)
      .where(pmod(col("qid"), lit(10000000L)) ===
        pmod(col("vec_id"), lit(10000000L)))
      .select("qid").distinct().count()
    assert(sameBase > n / 2,
      s"only $sameBase/$n queries kept a replica neighbor — recall collapsed?")
  }

  test("dedupAgainstIndex at 10x: batch probe is batch-sized work") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-lsh").toString
    val (_, tBuild) = timed {
      Dedup.writeLshIndex(docs10, "doc_id", "text", idx)
    }
    // the probe batch: fresh near-dups of every 50th doc
    val batch = docs10.where(pmod(col("doc_id"), lit(50)) === 0)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"),
        concat(col("text"), lit(" probe")).as("text"))
    val (matches, tProbe) = timed {
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx,
        threshold = 0.5).count()
    }
    info(f"10x index build $tBuild%.1fs; batch probe $tProbe%.1fs, " +
      s"$matches matches")
    assert(matches > 0, "planted probes must match their source docs")
    assert(tProbe < tBuild * 2 + 30.0,
      "probing must not degenerate into corpus-sized work")
  }
}
