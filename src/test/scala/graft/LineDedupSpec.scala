package graft

import org.apache.spark.sql.functions._

import graft.operators.LineDedup

/** Pins the corpus-level line-dedup semantics on a hand-computable line
  * table (the registered queries `text_boilerplate_drop` /
  * `text_line_dedup_first` are oracle-checked at corpus scale; this
  * pins df-vs-multiplicity, drop-everywhere, and first-occurrence
  * ordering directly).
  */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  // (doc, line_no, line): "a" appears twice in doc 1 and once in doc 3
  // (df 2, multiplicity 3); "b" in docs 1 and 2 (df 2); "c" only doc 2.
  private lazy val lines = Seq(
    (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "a"),
    (2L, 0, "b"), (2L, 1, "c"),
    (3L, 0, "a")).toDF("doc_id", "line_no", "line")

  test("dropFrequent counts DOCUMENT frequency, not multiplicity") {
    // maxDf=2: df("a")=2 <= 2 keeps "a" despite 3 occurrences
    val kept = LineDedup.dropFrequent(lines, maxDf = 2)
    assert(kept.count() === 6)
    // maxDf=1: "a" and "b" (df 2) dropped EVERYWHERE, "c" survives
    val strict = LineDedup.dropFrequent(lines, maxDf = 1)
      .select("doc_id", "line_no", "line").as[(Long, Int, String)]
      .collect().toSet
    assert(strict === Set((2L, 1, "c")))
  }

  test("keepFirst keeps each distinct line at its minimum (doc, line_no)") {
    val first = LineDedup.keepFirst(lines)
      .select("doc_id", "line_no", "line").as[(Long, Int, String)]
      .collect().toSet
    assert(first === Set((1L, 0, "a"), (1L, 1, "b"), (2L, 1, "c")))
  }

  test("reassemble restores line order per document") {
    val rows = LineDedup.reassemble(lines, sep = "\n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows(1L) === ((3L, "a\nb\na")))
    assert(rows(2L) === ((2L, "b\nc")))
    assert(rows(3L) === ((1L, "a")))
  }

  test("corpus query drops the spliced boilerplate everywhere") {
    val out = graft.queries.TextQueries
      .boilerplateDrop(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("text").contains("subscribe to our newsletter"))
      .count() === 0)
    assert(out.where(col("text").contains("all rights reserved"))
      .count() === 0)
  }

  test("corpus keepFirst yields strictly fewer lines, all distinct") {
    val first = graft.queries.TextQueries
      .lineDedupFirst(spark, sfDir).cache()
    val n = first.count()
    assert(n > 0)
    assert(first.select("line").distinct().count() === n)
  }
}
