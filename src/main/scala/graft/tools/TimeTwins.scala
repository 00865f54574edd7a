package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: TIME (not just verify) the forced-distributed twins of
  * the driver-gated loops on the 10x rehearsal corpus — the r6 verdict
  * asked for perf numbers on the big-graph paths BEFORE a real
  * scale-up trips the gates (`ScaleRehearsalSpec` proves parity and
  * boundedness; this prints the wall-clock rows for TIMEONE.md).
  *
  * Usage: TimeTwins [baseSfDir] (default /root/testdata/sf0.01; the
  * corpus is replicated 10x with perturbed text like the rehearsal's
  * docs10 fixture).
  */
object TimeTwins {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs10 = {
      val b = graft.Tables(spark, base, "documents").select("doc_id", "text")
      (0 until 10).map { r =>
        b.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$r")).as("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }
    println(s"TWINS corpus: ${docs10.count()} docs (10x $base)")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"TWIN $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      a
    }

    val g = graft.operators.NearDupGraph.graph(docs10, "doc_id", "text",
      threshold = 0.2, dfCap = 50, minShared = 2, cacheKey = "twins-10x")
    val pairs = g.pairs.select("ida", "idb").localCheckpoint(true)
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(pairs.select(col("idb").as("src"), col("ida").as("dst")))
      .localCheckpoint(true)
    println(s"TWINS graph: ${pairs.count()} pairs")

    timed("pagerank_ranksDistributed_i3") {
      graft.operators.PageRank.ranksDistributed(edges, iters = 3,
        damping = 0.85).count()
    }
    timed("labelprop_communitiesDistributed_i3") {
      graft.operators.LabelProp.communitiesDistributed(edges, iters = 3)
        .count()
    }
    val seeds = edges.select(col("src").as("doc_id")).distinct()
      .where(pmod(col("doc_id"), lit(7)) === 0).localCheckpoint(true)
    timed("pagerank_personalizedDistributed_i3") {
      graft.operators.PageRank.personalizedDistributed(pairs, seeds,
        iters = 3, damping = 0.85).count()
    }
    timed("dedup_connectedComponentsDistributed") {
      graft.operators.Dedup.connectedComponentsDistributed(pairs).count()
    }
    // registered-query parameters (TrainingQueries/TextQueries), gate
    // forced to 0 so the distributed merge/EM loops run end to end
    timed("bpe_trainDistributed_m30") {
      graft.operators.Bpe.trainSnapshotsGated(docs10, "text", Seq(20, 30),
        driverGate = 0L)._1.size
    }
    timed("ulm_trainDistributed_v512") {
      graft.operators.UnigramLm.trainGated(docs10, "text",
        targetVocab = 512, maxPieceLen = 5, emIters = 2,
        maxCandidates = 2048, driverGate = 0L)._1.size
    }
    timed("wordpiece_trainDistributed_m30") {
      graft.operators.WordPiece.trainDistributed(
        graft.operators.Bpe.wordCounts(docs10, "text").localCheckpoint(true),
        nMerges = 30)._1.merges.size
    }
    spark.stop()
  }
}
