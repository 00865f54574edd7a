package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage breakdown of multimodal_audio_match.
  * `TimeAudio x100 [cpus]` stages the COLLISION-HEAVY 100x corpus
  * (50k single-tone waves of 6656 samples, frameSize 512 — since
  * round 10 this is Scale100Spec's ADVERSARIAL df-cap fixture; the
  * headline rehearsal uses the two-tone 2048-frame realistic-entropy
  * construction and is staged inside the spec itself).
  */
object TimeAudio {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("x100")) { main100(args.drop(1)); return }
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
        (128 + 127 * math.cos(2 * math.Pi * freqs(i / 256) * (i % 256) / 256.0)).toByte
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

  /** The Scale100Spec audio construction, staged (default local[4] to
    * mirror the spec).
    */
  private def main100(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "4"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val wave = udf { id: Long =>
      var st = id * 6364136223846793005L + 1442695040888963407L
      def next(): Int = {
        st = st * 6364136223846793005L + 1442695040888963407L
        (((st >>> 33) % 250) + 1).toInt
      }
      val freqs = Array.fill(13)(next())
      Array.tabulate(6656) { i =>
        (128 + 127 * math.cos(2 * math.Pi * freqs(i / 512) * (i % 512) / 512.0))
          .toByte
      }
    }
    val packed = spark.range(50000)
      .select(col("id"), wave(col("id")).as("payload"))
      .localCheckpoint(true)
    val shift = udf { p: Array[Byte] =>
      Array.tabulate(512)(i =>
        (128 + 127 * math.cos(2 * math.Pi * 9 * i / 512.0)).toByte) ++ p
    }
    val twins = packed.where(col("id") < 50)
      .select((col("id") + 10000000L).as("id"),
        shift(col("payload")).as("payload"))
    val all = packed.unionByName(twins)
    println("waves=" + t("all.count")(all.count()))
    val lt = t("landmarkTable+ckpt")(
      graft.operators.AudioFingerprint.landmarkTable(
        all.repartition(col("id")), 512, 256, 2, 2).localCheckpoint(true))
    println("landmarks=" + t("lt.count")(lt.count()))
    val rare = lt.groupBy("hash").agg(countDistinct("id").as("df"))
      .where(col("df") <= 50 && col("df") >= 2)
    println("rareHashes=" + t("rare.count")(rare.count()))
    val ltr = lt.join(broadcast(rare.select("hash")), "hash")
      .repartition(col("hash")).localCheckpoint(true)
    println("postings=" + t("ltr.count")(ltr.count()))
    val votes = ltr.as("a").join(ltr.as("b"),
        col("a.hash") === col("b.hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"),
        (col("b.t") - col("a.t")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    println("voteRows=" + t("votes.count")(votes.count()))
    t("full")(println("matches=" +
      graft.operators.AudioFingerprint.matches(all, minVotes = 60,
        frameSize = 512, hop = 256, peaksPerFrame = 2, fanout = 2).count()))
    spark.stop()
  }
}
