package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the corpus funnel. */
object TimeFunnel {
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
    import graft.pipeline.CorpusPipeline
    import graft.operators.Dedup
    val cfg = CorpusPipeline.Config()
    val docs = graft.Tables(spark, sfDir, "documents")
    t("warmup")(docs.count())
    val lang = CorpusPipeline.languageFiltered(docs, cfg)
    val quality = CorpusPipeline.qualityFiltered(lang, cfg).persist()
    t("quality.count")(println("  q=" + quality.count()))
    val exact = CorpusPipeline.exactDeduped(quality).persist()
    t("exact.count")(println("  e=" + exact.count()))
    val pairs = Dedup.minhashLshPairs(exact, "doc_id", "text", cfg.dedupThreshold)
    t("minhash.pairs.count")(println("  p=" + pairs.count()))
    val comps = Dedup.connectedComponents(pairs)
    t("cc.count")(println("  c=" + comps.count()))
    val surv = Dedup.survivorsFromPairs(exact, "doc_id", pairs)
    t("survivors.agg")(println("  s=" + surv
      .agg(count(lit(1)), sum(graft.text.TextOps.tokenCount(col("text")).cast("long")))
      .collect()(0)))
    t("funnel.full")(println(CorpusPipeline.funnel(docs, cfg).collect().mkString("; ")))
    spark.stop()
  }
}
