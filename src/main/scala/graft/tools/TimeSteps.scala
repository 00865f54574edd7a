package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the jaccard blocking plan. */
object TimeSteps {
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
    val docs = graft.Tables(spark, sfDir, "documents")
    val sh = graft.operators.Dedup.shingled(docs, "doc_id", "text")
    t("shingled.count")(println("  rows=" + sh.count()))
    val ex = sh.select(col("doc_id"), explode(col("shs")).as("s"))
    t("explode.count")(println("  rows=" + ex.count()))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") <= 50 && col("df") >= 2)
    t("rare.count")(println("  rows=" + rare.count()))
    val exc = ex.join(broadcast(rare.select("s")), "s")
    val cand = exc.as("a").join(exc.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    t("candidates.count")(println("  rows=" + cand.count()))
    val ver = graft.operators.Dedup.verifyJaccard(cand, sh, 0.2)
    t("verify.count")(println("  rows=" + ver.count()))
    t("full.query")(println("  rows=" +
      graft.queries.DedupQueries.shingleJaccard(spark, sfDir).count()))
    spark.stop()
  }
}
