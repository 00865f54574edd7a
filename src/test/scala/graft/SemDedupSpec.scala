package graft

import org.apache.spark.sql.functions._

import graft.operators.SemDedup

/** Pins the SemDeDup prune semantics on hand-computable vectors (the
  * registered queries are oracle-checked / golden-pinned at corpus
  * scale; this pins pair scoping, the keep rule, and group identity
  * directly).
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // cluster 0: ids 1,2 nearly parallel (cos ~ 0.99995) and 3 orthogonal;
  // cluster 1: id 4 IDENTICAL to id 1 but in another cluster.
  // dist2 ranks id 2 as least prototypical in its group.
  private lazy val assigned = Seq(
    (1L, Seq(1f, 0f), 0, 1.0),
    (2L, Seq(1f, 0.01f), 0, 2.0),
    (3L, Seq(0f, 1f), 0, 5.0),
    (4L, Seq(1f, 0f), 1, 0.5)).toDF("vec_id", "embedding", "cluster", "dist2")

  private lazy val out = SemDedup.prune(assigned, eps = 0.9)
    .select("vec_id", "cluster", "component", "keep")
    .as[(Long, Int, Option[Long], Boolean)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("within-cluster near-parallel pair forms one group, min-id component") {
    assert(out(1L)._2 === Some(1L))
    assert(out(2L)._2 === Some(1L))
  }

  test("keep rule: the highest-dist2 (least prototypical) member survives") {
    assert(out(2L)._3 === true)
    assert(out(1L)._3 === false)
  }

  test("identical vectors in DIFFERENT clusters are never paired") {
    assert(out(4L) === ((1, None, true)))
  }

  test("singletons keep with null component") {
    assert(out(3L) === ((0, None, true)))
  }

  test("corpus run: one survivor per group, component = min member id") {
    val res = graft.queries.DedupQueries.semantic(spark, sfDir).cache()
    val groups = res.where(col("component").isNotNull)
      .groupBy("component")
      .agg(count(lit(1)).as("n"),
        sum(col("keep").cast("long")).as("n_keep"),
        min("vec_id").as("min_id"))
    assert(groups.where(col("n_keep") =!= 1).count() === 0)
    assert(groups.where(col("component") =!= col("min_id")).count() === 0)
    assert(groups.where(col("n") < 2).count() === 0)
  }
}
