package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  test("ranks sum to 1 and a symmetric clique is uniform") {
    // K4: every node identical by symmetry, so ranks must be equal and
    // the distribution must stay a probability vector at every k
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("ida", "idb")
    val r = PageRank.ranks(k4, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"sum=${r.values.sum}")
    assert(r.values.forall(v => math.abs(v - 0.25) < 1e-12), r.toString)
  }

  test("driver and distributed paths agree to rounding") {
    // an asymmetric graph (star + chain tail) so agreement is not a
    // symmetry accident; 6 decimal places is the registered query's
    // rounding contract
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 2L)).toDF("ida", "idb")
    val edges = g.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(g.select(col("idb").as("src"), col("ida").as("dst")))
    val a = PageRank.ranksOnDriver(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e6))
      .toMap
    val b = PageRank.ranksDistributed(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e6))
      .toMap
    assert(a == b)
  }

  test("string ids survive the driver path with their type intact") {
    // the driver fast path must not narrow the public doc_id contract:
    // a UUID/string graph (well under the 4M-edge gate) keeps string
    // ids and matches the distributed path's values
    val g = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("d", "e"),
      ("e", "f"), ("f", "b")).toDF("ida", "idb")
    val out = PageRank.ranks(g, iters = 3)
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val a = out.collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e6)).toMap
    assert(a.keySet == Set("a", "b", "c", "d", "e", "f"))
    val edges = g.select(col("ida").as("src"), col("idb").as("dst"))
      .unionAll(g.select(col("idb").as("src"), col("ida").as("dst")))
    val b = PageRank.ranksDistributed(edges, iters = 3, damping = 0.85)
      .collect()
      .map(r => r.getString(0) -> math.rint(r.getDouble(1) * 1e6)).toMap
    assert(a == b)
  }

  test("personalized PageRank concentrates mass around its seeds") {
    // chain 1-2-3-4-5-6, seed at node 1: mass must decay with
    // distance from the seed, and unreached-by-3-hops nodes are
    // absent (sparse rank table — the PPR scale contract)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("ida", "idb")
    val seeds = Seq(Tuple1(1L)).toDF("doc_id")
    val r = graft.operators.PageRank.personalized(chain, seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L), s"reached = ${r.keySet}")
    // no distance-decay claim on the chain: un-converged diffusion on
    // a path oscillates with bipartite parity (measured r3: node 2
    // holds the wave, node 3 is in a trough) — the structural claims
    // are the sparse reach set, the mass bound, and hub dominance
    // total mass is bounded by 1 (teleport + damped flow conserve <= 1)
    assert(r.values.sum <= 1.0 + 1e-9, s"mass ${r.values.sum}")
    // a hub-seeded star keeps the hub on top (all mass returns to it)
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
      .toDF("ida", "idb")
    val rs = graft.operators.PageRank.personalized(star,
        Seq(Tuple1(10L)).toDF("doc_id"), iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert((1L to 4L).forall(l => rs(10L) > rs(l)), rs.toString)
    // driver and distributed paths agree to the 6dp rounding contract
    val a = graft.operators.PageRank.personalizedOnDriver(chain, seeds,
        iters = 3, damping = 0.85).collect()
      .map(x => x.getLong(0) -> math.rint(x.getDouble(1) * 1e6)).toMap
    val b = graft.operators.PageRank.personalizedDistributed(chain, seeds,
        iters = 3, damping = 0.85).collect()
      .map(x => x.getLong(0) -> math.rint(x.getDouble(1) * 1e6)).toMap
    assert(a == b, s"driver=$a distributed=$b")
    // a seed outside the graph must be rejected, not silently ignored
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.personalized(chain,
        Seq(Tuple1(99L)).toDF("doc_id"), iters = 3)
    }
  }

  test("a hub out-ranks leaves on a star graph") {
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L))
      .toDF("ida", "idb")
    val r = PageRank.ranks(star, iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    val leaves = (1L to 5L).map(r)
    assert(leaves.forall(v => r(10L) > 2 * v),
      s"hub=${r(10L)} leaves=$leaves")
    // leaves are symmetric: identical ranks
    assert(leaves.forall(v => math.abs(v - leaves.head) < 1e-12))
  }
}
