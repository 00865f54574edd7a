package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class ConnectedComponentsSpec extends SparkSpec {

  private def driverComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    // driver-side union-find ground truth
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("label propagation matches driver-side union-find") {
    val docs = Tables(spark, sfDir, "documents")
    val pairsDf = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty)
    val got = Dedup.connectedComponents(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == driverComponents(pairs))
  }

  test("string ids stay strings (no driver fast path, no long cast)") {
    import spark.implicits._
    val pairsDf = Seq(("docA", "docB"), ("docB", "docC"), ("docX", "docY"))
      .toDF("ida", "idb")
    val got = Dedup.connectedComponents(pairsDf)
    assert(got.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(got.schema("component").dataType ===
      org.apache.spark.sql.types.StringType)
    val m = got.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
      "docX" -> "docX", "docY" -> "docX"))
  }

  test("integer ids keep their type through the driver fast path") {
    import spark.implicits._
    val pairsDf = Seq((1, 2), (2, 3), (10, 11)).toDF("ida", "idb")
    val got = Dedup.connectedComponents(pairsDf)
    assert(got.schema("component").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val m = got.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("survivors keep exactly one representative per cluster") {
    val docs = Tables(spark, sfDir, "documents")
    val total = docs.count()
    // same pair source as Dedup.survivors (MinHash-LSH at 0.5)
    val comps = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val clusters = comps.groupBy(_._2)
    val expectedDropped = comps.length - clusters.size
    val surv = Dedup.survivors(docs, "doc_id", "text", 0.2)
    assert(surv.count() == total - expectedDropped)
    // every cluster representative (min id) survives
    val survIds = surv.select("doc_id").collect().map(_.getLong(0)).toSet
    clusters.keys.foreach(rep => assert(survIds.contains(rep)))
  }

  test("chain graphs collapse to one component") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("ida", "idb")
    val got = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("driver fast path and distributed loop agree exactly") {
    val docs = Tables(spark, sfDir, "documents")
    val pairsDf = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
    val fast = Dedup.connectedComponents(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairsDf, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
  }

  test("pointer jumping matches plain propagation on the corpus pairs") {
    val docs = Tables(spark, sfDir, "documents")
    val pairsDf = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
    val plain = Dedup.connectedComponents(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jumped = Dedup.connectedComponentsPointerJump(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(jumped == plain)
  }

  test("pointer jumping collapses a 64-hop chain in O(log d) rounds") {
    import spark.implicits._
    // plain min-label propagation needs ~63 rounds for this topology;
    // doubling must finish it within the 10-round budget
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("ida", "idb")
    val got = Dedup.connectedComponentsPointerJump(chain, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 64L).map(_ -> 1L).toMap)
  }

  test("alternating star algorithm matches propagation on the corpus pairs") {
    val docs = Tables(spark, sfDir, "documents")
    val pairsDf = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
    val plain = Dedup.connectedComponents(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == plain)
  }

  test("all three algorithms match union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 50
      val pairs = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = pairs.toDF("ida", "idb")
      val expect = driverComponents(pairs)
      val prop = Dedup.connectedComponents(df, maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val jump = Dedup.connectedComponentsPointerJump(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == expect && star == expect && jump == expect)
    }
  }

  test("alternating star collapses adversarial topologies") {
    import spark.implicits._
    // 48-hop chain + a separate star + an isolated pair
    val edges = ((1L until 48L).map(i => (i, i + 1)) ++
      (101L to 110L).map(i => (100L, i)) ++ Seq((200L, 201L)))
      .toDF("ida", "idb")
    val got = Dedup.connectedComponentsStar(edges, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = driverComponents(
      ((1L until 48L).map(i => (i, i + 1)) ++
        (101L to 110L).map(i => (100L, i)) ++ Seq((200L, 201L))))
    assert(got == expect)
  }
}
