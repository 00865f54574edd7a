package graft

import org.apache.spark.sql.functions._

import graft.text.Stopwords

/** Every registered query runs on sf0.001 and returns rows; flagship
  * invariants from SURVEY.md §5.2 item 4.
  */
class QuerySmokeSpec extends SparkSpec {

  test("every query entry has a distinct, runnable plan") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed to execute")
    }
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
