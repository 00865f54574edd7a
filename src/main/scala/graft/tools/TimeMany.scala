package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time a comma-separated list of registered queries in
  * ONE session (the Bench execution shape — shared-JVM memos like the
  * BM25 term-frequency base and the dedup pair-graph cascade amortize
  * across the list, which per-query [[TimeOne]] JVMs cannot show).
  * Usage: TimeMany <name1,name2,...> [sfDir].
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (JIT + codegen caches) runs on sf0.001 — but NEVER on the
    // dir being timed: the session memos (pair graph, term-frequency
    // base) are keyed by dir, so warming the same dir would turn the
    // timed loop into a pure cache-hit measurement (r6 advisor finding)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(sfDir).getCanonicalPath ==
        new java.io.File(warmDir).getCanonicalPath)
      println(s"TIMED-WARN sfDir == $warmDir: skipping warm-up so the " +
        "timed loop pays the memo builds it is supposed to measure")
    else
      names.foreach(n => graft.SparkEntry.queries(n)(spark, warmDir).count())
    var total = 0.0
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      total += sec
      println(f"TIMED $n rows=$rows sec=$sec%.2f")
    }
    println(f"TIMED-TOTAL sec=$total%.2f")
    spark.stop()
  }
}
