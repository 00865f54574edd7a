package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage breakdown of multimodal_audio_match. */
object TimeAudio {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    val wave = udf { id: Long =>
      var st = id * 6364136223846793005L + 1442695040888963407L
      def next(): Int = {
        st = st * 6364136223846793005L + 1442695040888963407L
        (((st >>> 33) % 120) + 1).toInt
      }
      val freqs = Array.fill(13)(next())
      Array.tabulate(3200) { i =>
        (127 * math.cos(2 * math.Pi * freqs(i / 256) * (i % 256) / 256.0)).toByte
      }
    }
    val packed = graft.Tables(spark, dir, "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id").as("id"), wave(col("doc_id")).as("payload"))
    t("packed.count")(packed.count())
    val lt = t("landmarkTable+ckpt")(
      graft.operators.AudioFingerprint.landmarkTable(
        packed.repartition(col("id")), 256, 128, 2, 2).localCheckpoint(true))
    println("landmarks=" + lt.count())
    val rare = lt.groupBy("hash").agg(countDistinct("id").as("df"))
      .where(col("df") <= 50 && col("df") >= 2)
    println("rareHashes=" + t("rare.count")(rare.count()))
    val ltr = lt.join(broadcast(rare.select("hash")), "hash")
      .repartition(col("hash"))
    println("postings=" + t("ltr.count")(ltr.count()))
    val votes = ltr.as("a").join(ltr.as("b"),
        col("a.hash") === col("b.hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"),
        (col("b.t") - col("a.t")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    println("voteRows=" + t("votes.count")(votes.count()))
    spark.stop()
  }
}
