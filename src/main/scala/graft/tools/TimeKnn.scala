package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.IvfAnn

/** Dev utility: stage-by-stage timing of the kNN-graph join. */
object TimeKnn {
  def main(args: Array[String]): Unit = {
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
        round(VectorOps.dot(col("qemb"), col("embedding")) /
          (col("qnrm") * col("nrm")), 6).as("sim"))
    t("sims.count")(println("  s=" + sims.count()))
    t("sims.agg")(println("  sum=" + sims.agg(sum("sim")).collect()(0)))
    val top = org.apache.spark.sql.graftx.TopKPerKey
      .topK(sims, Seq("qid"), Seq(("sim", true), ("vec_id", false)), 5)
    t("topk.count")(println("  t=" + top.count()))
    t("full")(println("  f=" + IvfAnn.knnJoin(emb, emb, 5, 8, 8).count()))
    spark.stop()
  }
}
