package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{GraftExtensions, TopKPerKey, TopKPerKeyFinalExec, TopKPerKeyPartialExec, TopKPerKeyRewrite, TopKPerKeyStrategy}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The custom LogicalPlan/Strategy/SparkPlan top-k-per-key operator:
  * result equivalence with the window formulation, physical shape
  * (partial heap BELOW the exchange), and edge cases.
  */
class TopKPerKeySpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 5.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0),
      ("c", 7L, 9.0))
      .toDF("k", "id", "v")
      .repartition(3) // multiple input partitions so the partial matters
  }

  test("matches window row_number formulation") {
    val native = TopKPerKey.topK(sample, Seq("k"),
      Seq(("v", true), ("id", false)), k = 2)
      .select("k", "id", "v", "rank")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val windowed = sample
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 2)
      .select("k", "id", "v", "rank")
    assert(native.collect().toSet === windowed.collect().toSet)
  }

  test("k larger than any group returns everything ranked") {
    val out = TopKPerKey.topK(sample, Seq("k"),
      Seq(("v", false), ("id", false)), k = 100)
    assert(out.count() === sample.count())
    assert(out.where(col("k") === "c").select("rank")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("ascending order takes the smallest") {
    val out = TopKPerKey.topK(sample, Seq("k"),
      Seq(("v", false), ("id", false)), k = 1)
      .where(col("k") === "a").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(4L)) // v=5.0 is the minimum in group a
  }

  test("physical plan: partial heap below the exchange, final above") {
    val out = TopKPerKey.topK(sample, Seq("k"), Seq(("v", true), ("id", false)), 2)
    out.collect() // force planning/execution (AQE finalizes the plan)
    // AQE wraps shuffles in QueryStageExec LEAF nodes; flatten through
    // them to see the whole physical tree
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val all = flatten(out.queryExecution.executedPlan)
    val finals = all.collect { case f: TopKPerKeyFinalExec => f }
    assert(finals.size === 1)
    // below the final: an exchange, and the partial below that exchange
    val sub = flatten(finals.head.child)
    assert(sub.exists(n => n.isInstanceOf[ShuffleExchangeExec] ||
      n.isInstanceOf[org.apache.spark.sql.execution.adaptive.QueryStageExec]))
    assert(sub.exists(_.isInstanceOf[TopKPerKeyPartialExec]))
  }

  test("optimizer rule rewrites row_number filter into the native node") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(TopKPerKeyRewrite)
    s.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    import s.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0))
      .toDF("k", "id", "v").repartition(3)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 1)
    val rows = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(rows === Set(("a", 2L, 1), ("b", 6L, 1)))
    // the optimized plan must contain the native node, not a Window
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect {
      case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.size === 1)
    assert(opt.collect {
      case n: org.apache.spark.sql.catalyst.plans.logical.Window => n }.isEmpty)
    // rank keeps the window's IntegerType under the original attr id
    assert(q.schema("rank").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("GLOBAL row_number top-k (empty partition spec) keeps the stock path") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(TopKPerKeyRewrite)
    s.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    import s.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0))
      .toDF("k", "id", "v").repartition(3)
    // no PARTITION BY: the native exec's ClusteredDistribution(Nil)
    // would be rejected at planning — the rule must not fire
    val w = Window.orderBy(col("v").desc, col("id"))
    val q = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 2)
    assert(q.queryExecution.optimizedPlan.collect {
      case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.isEmpty)
    assert(q.collect().map(_.getLong(1)).toSet === Set(2L, 1L))
  }

  test("rule leaves non-matching window shapes alone") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(TopKPerKeyRewrite)
    s.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    import s.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0)).toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    // rank() (not row_number) must keep the stock Window path
    val q = df.withColumn("r", rank().over(w)).where(col("r") <= 1)
    assert(q.queryExecution.optimizedPlan.collect {
      case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.isEmpty)
    assert(q.collect().nonEmpty)
  }

  test("GraftExtensions wires rule + strategy into a session") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force SparkSpec session creation first
    // getOrCreate only applies extensions when it CREATES a session, so
    // clear the active/default handles (the SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0))
        .toDF("k", "id", "v")
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val q = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 1)
      assert(q.queryExecution.optimizedPlan.collect {
        case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.size === 1)
      assert(q.collect().map(_.getLong(1)).toSet === Set(2L, 3L))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("Graft.session entry point delivers a wired session") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.Graft.session(master = "local[4]", shufflePartitions = 4)
    try {
      import s.implicits._
      assert(s.conf.get("spark.sql.shuffle.partitions") === "4")
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0)).toDF("k", "id", "v")
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val q = df.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 1)
      assert(q.queryExecution.optimizedPlan.collect {
        case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.size === 1)
      // the native expressions are injected as SQL functions too
      assert(s.sql(
        "SELECT dot_product(array(float(1.0), float(2.0)), " +
          "array(float(3.0), float(4.0)))")
        .collect()(0).getDouble(0) === 11.0)
      assert(s.sql("SELECT interleave_bits(1L, 1L)")
        .collect()(0).getLong(0) === 3L)
      // config-taking expressions: SQL literals must agree with the
      // column API, and non-literal config args are rejected
      val txt = "the quick brown fox jumps over the lazy dog again"
      val fromSql = s.sql(
        s"SELECT minhash_bands(text_shingles('$txt'), 8, 2) AS b, " +
          s"text_winnow('$txt', 7, 4) AS w, " +
          "lemmatize_nouns(array('publications', 'men')) AS l")
        .collect()(0)
      val fromApi = Seq(txt).toDF("t").select(
        org.apache.spark.sql.graftx.MinHashBands.column(
          org.apache.spark.sql.graftx.TextShingles.column($"t"), 8, 2).as("b"),
        org.apache.spark.sql.graftx.TextWinnow.column($"t", 7, 4).as("w"),
        org.apache.spark.sql.graftx.LemmatizeNouns.column(
          array(lit("publications"), lit("men"))).as("l"))
        .collect()(0)
      assert(fromSql.getSeq[Long](0) === fromApi.getSeq[Long](0))
      assert(fromSql.getSeq[Long](1) === fromApi.getSeq[Long](1))
      assert(fromSql.getSeq[String](2) === Seq("publication", "man"))
      assert(fromApi.getSeq[String](2) === Seq("publication", "man"))
      assertThrows[Exception] {
        s.sql("SELECT minhash_bands(text_shingles('x y z'), 1 + 7, 2)")
          .collect()
      }
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("null order values match window null ordering") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 10.0), ("a", 2L, null), ("a", 3L, 30.0),
      ("b", 4L, null), ("b", 5L, null))
      .toDF("k", "id", "v").repartition(2)
    val native = TopKPerKey.topK(df, Seq("k"),
      Seq(("v", true), ("id", false)), 2)
      .select("k", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val windowed = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 2)
      .select("k", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(native === windowed) // DESC NULLS LAST on both paths
  }

  test("randomized equivalence with the window formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(150)
      val data = Seq.tabulate(n)(i =>
        (s"k${rnd.nextInt(8)}", i.toLong, rnd.nextInt(40).toDouble))
      val k = 1 + rnd.nextInt(4)
      val df = data.toDF("k", "id", "v").repartition(1 + rnd.nextInt(5))
      val native = TopKPerKey.topK(df, Seq("k"),
        Seq(("v", true), ("id", false)), k)
        .select("k", "id", "v", "rank").collect().map(_.toSeq).toSet
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val windowed = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
        .select("k", "id", "v", "rank").collect().map(_.toSeq).toSet
      assert(native === windowed, s"trial $trial (n=$n k=$k)")
    }
  }

  test("rank = 1 filter (keep-first-per-key) rewrites to the native node") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(TopKPerKeyRewrite)
    s.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    import s.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0))
      .toDF("k", "id", "v").repartition(3)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("k", "id")
    assert(q.queryExecution.optimizedPlan.collect {
      case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.size === 1)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 2L), ("b", 6L)))
    // rn = 2 is a middle-rank pick, NOT a top-k — must keep the window
    val q2 = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 2)
    assert(q2.queryExecution.optimizedPlan.collect {
      case n: org.apache.spark.sql.graftx.TopKPerKeyNode => n }.isEmpty)
    assert(q2.collect().map(_.getLong(1)).toSet === Set(3L, 5L))
  }

  test("map-side flush bound: high key cardinality stays correct and flushes") {
    // Adversarial shape for the partial heap map: every input row is a
    // distinct key, so without the flush bound the map would hold the
    // whole partition (the knnJoin query-side growth mode). With the
    // cap at 64 retained rows the partial drains and restarts; the
    // final re-heaps, so the answer must be identical to the window.
    import spark.implicits._
    val n = 2000
    val df = spark.range(n)
      .select((col("id") % 500).as("k"), col("id"),
        (col("id") % 37).cast("double").as("v"))
      .repartition(3)
    val key = org.apache.spark.sql.graftx.TopKPerKey.PartialFlushRowsKey
    spark.conf.set(key, "64")
    try {
      val native = TopKPerKey.topK(df, Seq("k"),
        Seq(("v", true), ("id", false)), 2)
        .select("k", "id", "v", "rank")
      val rows = native.collect().map(_.toSeq).toSet
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val windowed = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 2)
        .select("k", "id", "v", "rank").collect().map(_.toSeq).toSet
      assert(rows === windowed)
      // the bound actually engaged: each 667-row partition holds ~500
      // distinct keys, far above the 64-row cap
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val partials = flatten(native.queryExecution.executedPlan)
        .collect { case p: TopKPerKeyPartialExec => p }
      assert(partials.nonEmpty)
      assert(partials.head.metrics("numFlushes").value > 0,
        "flush threshold never engaged — the adversarial case isn't adversarial")
    } finally spark.conf.unset(key)
  }

  test("downstream per-key aggregation reuses the top-k exchange") {
    // the final exec advertises its child's hash partitioning, so a
    // groupBy on (key, ...) above it must NOT plant a second exchange
    // — the knnClassify vote shape (top-k per qid -> votes per
    // (qid, label)) pays exactly one shuffle end to end. Input NOT
    // pre-repartitioned: the only exchange in the plan must be the
    // top-k's own.
    import spark.implicits._
    val flat = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0),
      ("b", 5L, 1.0), ("b", 6L, 2.0), ("c", 7L, 9.0))
      .toDF("k", "id", "v")
    val agged = TopKPerKey.topK(flat, Seq("k"),
        Seq(("v", true), ("id", false)), 2)
      .groupBy("k", "v").count()
    agged.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val exchanges = flatten(agged.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchanges == 1,
      s"$exchanges exchanges — the vote aggregation re-shuffled rows " +
        "already clustered by the top-k key")
  }

  test("partial emits at most k rows per key per partition") {
    // single group spread over 3 partitions: final input <= 3*k, output = k
    val out = TopKPerKey.topK(sample.withColumn("k", lit("one")),
      Seq("k"), Seq(("v", true), ("id", false)), 2)
    assert(out.count() === 2)
    assert(out.select("rank").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
