package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("overlap join: exactly-once emission equals the naive cross join") {
    // boundary-heavy fixture: touching endpoints, containment, spans
    // crossing many bins, identical intervals
    val left = Seq((1L, 0.0, 10.0), (2L, 10.0, 20.0), (3L, 5.0, 6.0),
      (4L, -35.0, 55.0), (5L, 0.0, 10.0)).toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, 10.0, 12.0), (11L, 20.5, 30.0), (12L, 4.0, 7.0),
      (13L, -100.0, 100.0), (14L, 6.0, 6.0)).toDF("rid", "r_lo", "r_hi")
    for (w <- Seq(1.0, 3.0, 50.0, 1000.0)) {
      val binned = RangeJoin.binnedOverlapJoin(left, right,
          "l_lo", "l_hi", "r_lo", "r_hi", binWidth = w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val naive = left.crossJoin(right)
        .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.sorted.toSeq == naive.sorted.toSeq,
        s"binWidth=$w: ${binned.sorted.toSeq} vs ${naive.sorted.toSeq}")
      assert(binned.length == binned.distinct.length,
        s"binWidth=$w emitted duplicates")
    }
  }
}
