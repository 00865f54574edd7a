package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileBin

/** The approx equi-depth path against the exact ntile formulation. */
class QuantileBinSpec extends SparkSpec {

  private lazy val li = Tables(spark, sfDir, "lineitem")

  test("bins are order-consistent and populations near n/k") {
    val k = 8
    val binned = QuantileBin.equiDepth(li, "l_extendedprice", k).cache()
    val n = binned.count()
    val perBin = binned.groupBy("bin")
      .agg(count(lit(1)).as("c"),
        min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .orderBy("bin")
      .collect()
    assert(perBin.length === k)
    // value ranges must not overlap across bins
    perBin.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2))
      case _ => ()
    }
    // populations within 10% of the ideal equal split (sketch relErr
    // plus tie mass; prices are near-unique so this is tight)
    val ideal = n.toDouble / k
    perBin.foreach { r =>
      assert(math.abs(r.getLong(1) - ideal) <= ideal * 0.1,
        s"bin ${r.getInt(0)} count ${r.getLong(1)} vs ideal $ideal")
    }
  }

  test("cutpoints are monotone and strictly inside the value range") {
    val cuts = QuantileBin.cutpoints(li, "l_extendedprice", 8)
    assert(cuts.length === 7)
    assert(cuts.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    val Array(lo, hi) = li.agg(min("l_extendedprice"), max("l_extendedprice"))
      .collect().map(r => Array(r.getDouble(0), r.getDouble(1))).head
    assert(cuts.head > lo && cuts.last < hi)
  }

  test("exactNtile == SQL ntile on 1000 random values, several k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (0 until 1000).map(i => (i.toLong, rnd.nextDouble() * 40 - 20))
      .toDF("id", "v").cache()
    for (k <- Seq(3, 7, 32)) {
      val mine = graft.operators.QuantileBin
        .exactNtile(df, k = k, valueCol = "v", bucketWidth = 1.0,
          tieCols = Seq("id"))
        .select("id", "tile").as[(Long, Long)].collect().toMap
      val ref = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long").as("t"))
        .as[(Long, Long)].collect().toMap
      assert(mine === ref, s"disagreement at k=$k")
    }
    df.unpersist()
  }

  test("exactNtile replicates SQL ntile incl. remainder-first tiles") {
    import spark.implicits._
    // n=7, k=3 -> tile sizes 3,2,2 in value order; values straddle
    // bucket boundaries (width 10) to exercise the offset join
    val df = Seq(5.0, 25.0, 15.0, 8.0, 31.0, 12.0, 29.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = graft.operators.QuantileBin
      .exactNtile(df, k = 3, valueCol = "v", bucketWidth = 10.0,
        tieCols = Seq("id"))
    .select("v", "tile").as[(Double, Long)].collect().toMap
    assert(out === Map(5.0 -> 1L, 8.0 -> 1L, 12.0 -> 1L,
      15.0 -> 2L, 25.0 -> 2L, 29.0 -> 3L, 31.0 -> 3L))
  }
}
