package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.IvfAnn

/** Dev utility: isolate the per-candidate scoring cost of the kNN
  * join's 320M-pair fan-out — join-only vs dot vs dot+divide vs the
  * full round(dot/(qnrm*nrm), 6) the operator ships. Suspicion: Spark's
  * Round(double, 6) codegen routes every row through
  * BigDecimal.setScale (allocation + decimal arithmetic), so the
  * "cheap" final rounding dwarfs the 64-float dot it decorates.
  */
object TimeDot {
  def main(args: Array[String]): Unit = {
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
    import org.apache.spark.sql.functions.expr
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
    val cs = IvfAnn.trainCentroids(emb100, 256, sampleMod = 100)
    val assigned = emb100.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"),
      IvfAnn.assignColumn(cs)(col("embedding")).as("list_id"))
      .repartition(col("list_id")).localCheckpoint(true)
    val probes = emb100.select(col("vec_id").as("qid"),
      col("embedding").as("qemb"),
      VectorOps.norm(col("embedding")).as("qnrm"),
      explode(IvfAnn.probeColumn(cs, 8)(col("embedding"))).as("list_id"))
      .repartition(col("list_id")).localCheckpoint(true)
    val joined = assigned.join(probes, Seq("list_id"))
      .where(col("vec_id") =!= col("qid"))
    t("join_only")(println("  c=" +
      joined.agg(sum(col("qnrm"))).collect()(0)))
    val dot = VectorOps.dot(col("qemb"), col("embedding"))
    t("dot")(println("  d=" +
      joined.agg(sum(dot)).collect()(0)))
    t("dot_div")(println("  v=" +
      joined.agg(sum(dot / (col("qnrm") * col("nrm")))).collect()(0)))
    t("dot_div_round6")(println("  r=" +
      joined.agg(sum(round(dot / (col("qnrm") * col("nrm")), 6)))
        .collect()(0)))
    spark.stop()
  }
}
