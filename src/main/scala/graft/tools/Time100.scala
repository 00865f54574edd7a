package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: the 100x (sf1-equivalent) probes behind
  * `Scale100Spec` — run standalone to measure before calibrating the
  * spec's bounds (TIMEONE.md / docs/SCALING.md record the numbers).
  *
  * Corpus construction (the honest scaling fixture): 10 disjoint
  * SHARDS of the 10x docs10 corpus, each shard's every token prefixed
  * with its shard tag so shards share NO shingles — near-dup density
  * stays constant (10-replica groups) while the corpus grows 100x.
  * Naively replicating 100x instead would grow each near-dup group to
  * 100 members and the pair graph quadratically — a fixture artifact,
  * not an operator property.
  */
object Time100 {

  /** The ScaleRehearsalSpec docs10 fixture (10 perturbed replicas). */
  def docs10(spark: SparkSession, base: String) = {
    val b = graft.Tables(spark, base, "documents").select("doc_id", "text")
    (0 until 10).map { r =>
      b.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"))
    }.reduce(_ unionByName _)
  }

  def docs100(spark: SparkSession, base: String) =
    (0 until 10).map { s =>
      // letters-only shard tag: the shingle tokenizer is [a-zA-Z]
      // runs, so a digit in the tag would split off and collapse all
      // shards onto the same tokens
      val tag = s"q${('a' + s).toChar}"
      docs10(spark, base)
        .select((col("doc_id") + lit(s * 1000000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$tag$$1").as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)

  /** docs10 carrying lang/source — the columns the corpus pipeline's
    * language filter and per-source stages read.
    */
  def docs10Meta(spark: SparkSession, base: String) = {
    val b = graft.Tables(spark, base, "documents")
      .select("doc_id", "text", "lang", "source")
    (0 until 10).map { r =>
      b.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$r")).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
  }

  /** One tagged shard of the 100x pipeline corpus (shard s of
    * [[docs100Meta]]) — shard 0 is the 10x baseline the linearity
    * invariants compare against.
    */
  def pipelineShard(spark: SparkSession, base: String, s: Int) = {
    val tag = s"q${('a' + s).toChar}"
    docs10Meta(spark, base)
      .select((col("doc_id") + lit(s * 1000000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$tag$$1").as("text"),
        col("lang"), col("source"))
  }

  /** The 100x corpus WITH metadata: same 10-disjoint-shard
    * construction as [[docs100]] (near-dup density constant, shards
    * share no shingles), plus lang/source so the full corpus pipeline
    * (language filter -> quality -> dedup -> pack) can run over it.
    * Note the shard tag prefixes every token, so the stopword leg of
    * the quality filter is uniformly inert across shards — the
    * pipeline rehearsal measures COST and linearity, not stopword
    * selectivity (which sf-table queries already oracle-check).
    */
  def docs100Meta(spark: SparkSession, base: String) =
    (0 until 10).map(pipelineShard(spark, base, _))
      .reduce(_ unionByName _).localCheckpoint(true)

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"T100 $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      a
    }
    val d100 = docs100(spark, base)
    println(s"T100 corpus: ${d100.count()} docs")
    val g = timed("shingle_graph_build") {
      val g = graft.operators.NearDupGraph.graph(d100, "doc_id", "text",
        threshold = 0.2, dfCap = 50, minShared = 2, cacheKey = "t100")
      g.pairs.count()
      g
    }
    println(s"T100 pairs: ${g.pairs.count()} candidates: ${g.candidates.count()}")
    timed("shuffled_verify_no_broadcast") {
      graft.operators.Dedup.verifyJaccard(g.candidates, g.shingles, 0.2,
        Some(false)).count()
    }
    timed("containment_no_broadcast") {
      graft.queries.DedupQueries.containmentFrom(g.candidates, g.shingles,
        Some(false)).count()
    }
    // audio at 100x of the REGISTERED query's 500-doc slice = 50k waves
    import org.apache.spark.sql.functions.udf
    val wave = udf { id: Long =>
      var st = id * 6364136223846793005L + 1442695040888963407L
      def next(): Int = {
        st = st * 6364136223846793005L + 1442695040888963407L
        (((st >>> 33) % 250) + 1).toInt
      }
      val freqs = Array.fill(13)(next())
      Array.tabulate(6656) { i =>
        (127 * math.cos(2 * math.Pi * freqs(i / 512) * (i % 512) / 512.0))
          .toByte
      }
    }
    val packed = spark.range(50000)
      .select(col("id"), wave(col("id")).as("payload"))
      .localCheckpoint(true)
    val shift = udf { p: Array[Byte] =>
      Array.tabulate(512)(i =>
        (127 * math.cos(2 * math.Pi * 9 * i / 512.0)).toByte) ++ p
    }
    val twins = packed.where(col("id") < 50)
      .select((col("id") + 10000000L).as("id"),
        shift(col("payload")).as("payload"))
    timed("audio_match_50k") {
      val rows = graft.operators.AudioFingerprint.matches(
          packed.unionByName(twins), minVotes = 60,
          frameSize = 512, hop = 256, peaksPerFrame = 2, fanout = 2)
        .collect()
      val twinHits = rows.count(r => r.getLong(1) == r.getLong(0) + 10000000L)
      println(s"T100 audio: ${rows.length} matches, $twinHits/50 twins")
    }
    spark.stop()
  }
}
