package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftx.GraftExtensions

/** Library entry point: one call gives a session wired the way every
  * operator in this engine expects — the graftx extensions (native
  * top-k-per-key strategy + the optimizer rewrite that captures
  * `Filter(row_number() <= k)` windows), UTC session time (oracle and
  * cross-engine determinism), and shuffle parallelism sized to the
  * deployment instead of the 200-partition default.
  *
  * {{{
  * val spark = Graft.session(master = "local[32]", shufflePartitions = 32)
  * val docs  = Tables(spark, "/data/sf1", "documents")
  * val clean = graft.pipeline.CorpusPipeline.prepare(docs)
  * }}}
  *
  * On a cluster, pass no master (spark-submit provides it) and size
  * `shufflePartitions` to ~2-3x total executor cores; at 100 TB rely
  * on AQE coalescing (left enabled) to right-size each stage.
  */
object Graft {

  def session(master: String = "", appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
    (if (master.nonEmpty) b.master(master) else b).getOrCreate()
  }
}
