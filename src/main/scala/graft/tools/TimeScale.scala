package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: the CORE-SCALING ledger (r15, VERDICT r14 task 4) —
  * the driver's 8-vs-32-core block reads ~1.0 everywhere at sf0.1
  * because sub-second queries are driver/scheduling-bound, so nothing
  * demonstrated that any query parallelizes. This tool materializes a
  * ~10x sf0.1-derived dataset once and times a query list against it
  * at whatever core count `$SPARK_GRAFT_CPUS` says, so two runs
  * (8 vs 32) in one window give real per-query scaling ratios.
  *
  * Dataset construction (the honest fixtures, reused from the
  * Time100/TimeStreamFunnel rehearsals):
  *  - documents x10: 10 DISJOINT token-renamed shards (every token
  *    prefixed with a letters-only shard tag, ids offset per shard) —
  *    near-dup density and pair-graph size stay CONSTANT per shard, so
  *    dedup/pipeline queries grow linearly, not quadratically (a naive
  *    10x replication would inflate every near-dup group 10x and the
  *    pair graph ~45x — a fixture artifact, not an operator property).
  *  - embeddings x10: ids offset per replica and every component
  *    deterministically jittered (hash-seeded, ~1e-4 scale) so replicas
  *    are NOT bit-identical vectors — identical copies would collide
  *    into the same LSH/WTA buckets and blow candidate volume up
  *    quadratically for fixture reasons. Element type stays FLOAT.
  *  - orders/lineitem x10: order keys offset per replica (joins stay
  *    1:N within a replica); dimension tables (customer..region) stay
  *    1x — the realistic fact-grows/dims-don't shape.
  *  - events x10: event/user ids offset per replica — 10x users, same
  *    per-user session sizes, same time range.
  *
  * Usage: TimeScale <name1,name2,...> [baseDir] [outDir] [reps]
  * with `SPARK_GRAFT_CPUS` setting the core count (Bench's contract).
  * The dataset is built once (completion marker) and reused.
  */
object TimeScale {

  def buildDocs(spark: SparkSession, base: String): DataFrame = {
    val b = graft.Tables(spark, base, "documents")
    (0 until 10).map { s =>
      // letters-only tag: the tokenizer is [a-zA-Z] runs, a digit would
      // split off and collapse all shards onto the same tokens
      val tag = s"q${('a' + s).toChar}"
      b.select(
        (col("doc_id") + lit(s * 1000000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$tag$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  def buildEmbeddings(spark: SparkSession, base: String): DataFrame = {
    val b = graft.Tables(spark, base, "embeddings")
    (0 until 10).map { r =>
      val jitter =
        if (r == 0) col("embedding")
        else expr(s"transform(embedding, (x, i) -> cast(x + " +
          s"(pmod(xxhash64(vec_id * 16 + $r, i), 1000) - 500) * 2.0e-4 " +
          s"as float))")
      b.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        jitter.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  def buildOrders(spark: SparkSession, base: String): DataFrame = {
    val b = graft.Tables(spark, base, "orders")
    (0 until 10).map { r =>
      b.select((col("o_orderkey") + lit(r * 100000000L)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }.reduce(_ unionByName _)
  }

  def buildLineitem(spark: SparkSession, base: String): DataFrame = {
    val b = graft.Tables(spark, base, "lineitem")
    (0 until 10).map { r =>
      b.withColumn("l_orderkey", col("l_orderkey") + lit(r * 100000000L))
    }.reduce(_ unionByName _)
  }

  def buildEvents(spark: SparkSession, base: String): DataFrame = {
    val b = graft.Tables(spark, base, "events")
    (0 until 10).map { r =>
      b.withColumn("event_id", col("event_id") + lit(r * 100000000L))
        .withColumn("user_id", col("user_id") + lit(r * 10000000L))
    }.reduce(_ unionByName _)
  }

  def build(spark: SparkSession, base: String, out: String): Unit = {
    val marker = new java.io.File(s"$out/_GRAFT_SCALE10_COMPLETE")
    if (marker.exists()) return
    new java.io.File(out).mkdirs()
    def w(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    w(buildDocs(spark, base), "documents")
    w(buildEmbeddings(spark, base), "embeddings")
    w(buildOrders(spark, base), "orders")
    w(buildLineitem(spark, base), "lineitem")
    // events.ts: rewrite as TIMESTAMP (the session is UTC-pinned) —
    // Tables' schema-adaptive read normalizes either way
    w(buildEvents(spark, base), "events")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      w(spark.read.parquet(s"$base/$t.parquet"), t)
    }
    marker.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val base = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else "/tmp/graft_scale10"
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, base, out)
    // warm-up (JIT + codegen) on sf0.001, never on the timed dir (the
    // session memos are dir-keyed — TimeMany discipline)
    val warmDir = "/root/testdata/sf0.001"
    names.foreach(n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case e: Throwable =>
        println(s"WARM-FAIL $n: ${e.getMessage}") })
    (1 to reps).foreach { rep =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val rows =
          try graft.SparkEntry.queries(n)(spark, out).count()
          catch { case e: Throwable =>
            println(s"FAIL $n: ${e.toString.take(200)}"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SCALED cpus=$cpus $n rep=$rep rows=$rows sec=$sec%.2f")
      }
    }
    spark.stop()
  }
}
