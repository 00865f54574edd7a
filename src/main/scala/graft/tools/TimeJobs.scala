package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility: run registered queries with a job-level listener —
  * prints every Spark job's wall-clock and description, the
  * driver-round-trip decomposition TimeMany totals hide. Usage:
  * TimeJobs <name1,name2,...> [sfDir] [reps].
  */
object TimeJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (collecting && s != null)
          buf.synchronized {
            buf += f"  job ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e6}%8.1f ms  ${s._2}"
          }
      }
    })
    val warmDir = "/root/testdata/sf0.001"
    names.foreach(n => graft.SparkEntry.queries(n)(spark, warmDir).count())
    (1 to reps).foreach { rep =>
      names.foreach { n =>
        buf.synchronized(buf.clear())
        collecting = true
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        collecting = false
        println(f"TIMED $n rep=$rep rows=$rows sec=$sec%.2f")
        buf.synchronized(buf.foreach(println))
      }
    }
    spark.stop()
  }
}
