package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.IvfAnn

/** Dev utility: stage-by-stage timing of the kNN-graph join.
  * Usage: TimeKnn [sfDir] — or `TimeKnn x100 [cpus]` for the
  * Scale100Spec construction (50k vectors, nlist=256, nprobe=8).
  */
object TimeKnn {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("x100")) { main100(args.drop(1)); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables(spark, sfDir, "embeddings")
    t("warmup")(emb.count())
    val cs = t("train")(IvfAnn.trainCentroids(emb, 8))
    val assigned = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"),
      IvfAnn.assignColumn(cs)(col("embedding")).as("list_id"))
    t("assign.count")(println("  a=" + assigned.count()))
    val probes = emb.select(col("vec_id").as("qid"),
      col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm"),
      explode(IvfAnn.probeColumn(cs, 8)(col("embedding"))).as("list_id"))
    val sims = assigned.join(probes, Seq("list_id"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    t("sims.count")(println("  s=" + sims.count()))
    t("sims.agg")(println("  sum=" + sims.agg(sum("sim")).collect()(0)))
    val top = org.apache.spark.sql.graftx.TopKPerKey
      .topK(sims, Seq("qid"), Seq(("sim", true), ("vec_id", false)), 5)
    t("topk.count")(println("  t=" + top.count()))
    t("full")(println("  f=" + IvfAnn.knnJoin(emb, emb, 5, 8, 8).count()))
    spark.stop()
  }

  /** The Scale100Spec kNN construction, staged: 100 perturbed-replica
    * ranges of sf0.01 embeddings (50k vectors), nlist=256, nprobe=8,
    * sampleMod=100, k=5 — the decade's slowest number (docs/SCALING.md
    * 189-207 s). Default cpus=4 to mirror the spec's local[4].
    */
  private def main100(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "4"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val emb100 = (0 until 100).map { r =>
      base.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> " +
          s"x + float(0.001) * float($r % 10) * float(if(i % 2 = 0, 1, -1)))")
          .cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println("  n=" + emb100.count())
    val cs = t("train")(IvfAnn.trainCentroids(emb100, 256, sampleMod = 100))
    val assigned = emb100.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"),
      IvfAnn.assignColumn(cs)(col("embedding")).as("list_id"))
      .repartition(col("list_id"))
    t("assign.count")(println("  a=" + assigned.count()))
    val probes = emb100.select(col("vec_id").as("qid"),
      col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm"),
      explode(IvfAnn.probeColumn(cs, 8)(col("embedding"))).as("list_id"))
      .repartition(col("list_id"))
    t("probes.count")(println("  p=" + probes.count()))
    val sims = assigned.join(probes, Seq("list_id"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.simRound6(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm"))).as("sim"))
    t("sims.count")(println("  s=" + sims.count()))
    t("sims.agg")(println("  sum=" + sims.agg(sum("sim")).collect()(0)))
    val top = org.apache.spark.sql.graftx.TopKPerKey
      .topK(sims, Seq("qid"), Seq(("sim", true), ("vec_id", false)), 5)
    t("topk.count")(println("  t=" + top.count()))
    t("full")(println("  f=" +
      IvfAnn.knnJoin(emb100, emb100, 5, 256, 8, sampleMod = 100).count()))
    spark.stop()
  }
}
