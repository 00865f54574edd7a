package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelProp

/** Pins the synchronous-LPA contract: deterministic fixed-round
  * semantics (min-label tie-break), community structure that SPLITS
  * what connected components would merge, and driver/distributed
  * agreement.
  */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  // two triangles bridged by one edge: one connected component, two
  // dense neighborhoods
  private def dumbbell = Seq((1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("ida", "idb")

  test("dumbbell splits into its two triangles (hand-computed rounds)") {
    val out = LabelProp.communities(dumbbell, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // synchronous rounds with min-tie-break, computed by hand:
    // r1: 1->2 2->1 3->1 4->3 5->4 6->4
    // r2: 1->1 2->1 3->1 4->4 5->3 6->3
    // r3: {1,2,3}->1, {4,5,6}->3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), out.toString)
    // components would merge the whole dumbbell; LPA must not
    assert(out.values.toSet.size == 2)
  }

  test("driver and distributed paths agree exactly") {
    val edges = dumbbell
      .select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(dumbbell.select(col("idb").as("src"), col("ida").as("dst")))
    val a = LabelProp.communitiesOnDriver(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LabelProp.communitiesDistributed(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"driver=$a distributed=$b")
  }

  test("a clique is one community labeled by its smallest id") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("ida", "idb")
    val out = LabelProp.communities(k4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(1L), out.toString)
  }

  test("LPA communities refine connected components on the real corpus") {
    // labels only flow along edges and start as own ids, so any label
    // a node holds originated inside its component: same LPA label =>
    // same CC component, always (the refinement invariant)
    val lpa = graft.queries.DedupQueries.labelProp(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = graft.queries.DedupQueries.components(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.keySet == cc.keySet, "same node universe")
    val byLabel = lpa.groupBy(_._2).view.mapValues(_.keys.toSet)
    byLabel.foreach { case (lbl, members) =>
      val comps = members.map(cc)
      assert(comps.size == 1,
        s"LPA label $lbl spans components $comps (members $members)")
    }
    // and LPA is at least as fine: community count >= component count
    assert(lpa.values.toSet.size >= cc.values.toSet.size)
  }

  test("containment dominates jaccard on every candidate pair") {
    // |A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| for all sets — verified over
    // the real corpus' shared candidate table (catches any drift
    // between the two verify formulas reading the same cascade)
    val cont = graft.queries.DedupQueries
      .containmentPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val jac = graft.queries.DedupQueries.shingleJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(cont.nonEmpty && jac.nonEmpty)
    val both = jac.keySet.intersect(cont.keySet)
    assert(both.nonEmpty, "thresholded outputs must overlap on strong pairs")
    both.foreach { k =>
      assert(cont(k) >= jac(k) - 1e-9,
        s"pair $k: containment ${cont(k)} < jaccard ${jac(k)}")
    }
  }

  test("string ids take the distributed path and keep their type") {
    val g = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("ida", "idb")
    val out = LabelProp.communities(g, iters = 3)
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.values.toSet == Set("a"), m.toString)
  }
}
