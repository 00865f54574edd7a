package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew-join rehearsal: the OTHER half of the skew story.
  * `SkewJoin.saltedJoin` is the manual, always-works form; at a real
  * deployment the first line of defense is AQE splitting oversized
  * partitions at runtime. This pins that the engine's config path
  * actually triggers it: a synthesized 2/3-of-rows-on-one-key join,
  * forced through sort-merge, must come back with `isSkewJoin=true`
  * and correct results — so a Spark upgrade that changes the skew
  * heuristics fails here, not in production.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 2/3 of 300k rows land on key 0; the rest spread over 100 keys
      val left = spark.range(300000).select(
        when(pmod(col("id"), lit(3)) =!= 0, lit(0L))
          .otherwise(pmod(col("id"), lit(100))).as("k"),
        col("id").as("v"))
      val right = spark.range(100).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS df's queryExecution (count() would
      // finalize a different one) — correctness and plan in one run
      val n = joined.collect().length
      assert(n == 300000, s"join must keep every left row, got $n")

      val plan = {
        def flat(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
          case q: QueryStageExec => flat(q.plan)
          case other => other +: other.children.flatMap(flat)
        }
        flat(joined.queryExecution.executedPlan)
      }
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "the join must run as sort-merge")
      assert(smj.exists(_.isSkewJoin),
        s"AQE must mark the hot partition skewed:\n" +
          s"${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
