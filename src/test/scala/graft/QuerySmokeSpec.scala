package graft

import org.apache.spark.sql.functions._

import graft.text.Stopwords

/** Every registered query runs on sf0.001 and returns rows; flagship
  * invariants from SURVEY.md §5.2 item 4.
  */
class QuerySmokeSpec extends SparkSpec {

  test("every query entry has a distinct, runnable plan") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
      // Registry-wide scale guard: no registered query may plan a
      // partition-less Window (the single-reducer stage that moves
      // ALL rows to one task — the canonical 100 TB anti-pattern, and
      // the source of the WindowExec warnings in earlier bench runs).
      // Bounded prefix sums go through BoundedPrefix instead.
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a partition-less Window (single-reducer stage)")
    }
  }

  test("no registered query executes a shuffle cartesian product") {
    // Registry-wide scale guard #2: CartesianProductExec materializes
    // |L| x |R| via an all-pairs shuffle — unbounded at corpus scale.
    // Broadcast nested-loop joins are NOT flagged: AQE only picks them
    // when one side is genuinely small (1-row normalizing aggregates,
    // literal grids), which is the bounded pattern several queries use
    // deliberately.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case r: ReusedExchangeExec => Seq(r)
      case _ => p +: p.children.flatMap(flat)
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      val carts = flat(df.queryExecution.executedPlan)
        .collect { case c: CartesianProductExec => c }
      if (carts.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"shuffle cartesian product in: ${offenders.mkString(", ")}")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship keywords exclude stopwords and contain letters only") {
    val words = SparkEntry.entry(spark)
      .select("word").collect().map(_.getString(0))
    assert(words.nonEmpty)
    assert(words.forall(w => w.nonEmpty && w.forall(c => c.isLetter && c.isLower)))
    assert(words.toSet.intersect(Stopwords.english.toSet).isEmpty)
  }

  test("inverted index is per-document distinct") {
    val df = graft.queries.TextQueries.invertedIndex(spark, sfDir)
    assert(df.count() == df.dropDuplicates("word", "doc_id").count())
  }
}
