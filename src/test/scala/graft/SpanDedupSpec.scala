package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"

  private def run(docs: Seq[(Long, String)], n: Int = 5) =
    SpanDedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("a shared span is removed from every doc except the first") {
    val shared = "alpha beta gamma delta epsilon"
    val out = run(Seq(
      (1L, s"unique one two $shared"),
      (2L, s"$shared totally different tail here")))
    assert(out(1L)._2 == 0, "first occurrence keeps its tokens")
    assert(out(2L)._2 == 5, "second occurrence loses exactly the span")
  }

  test("an exact duplicate document collapses to empty") {
    val text = "one two three four five six seven"
    val out = run(Seq((1L, text), (2L, text)))
    assert(out(1L)._2 == 0)
    assert(out(2L) == ((7L, 7L, emptyMd5)), out(2L).toString)
  }

  test("overlapping repeated spans union at the token level") {
    // doc repeats its own first 6 tokens -> windows overlap; removed
    // indices must union, not double-count
    val out = run(Seq(
      (1L, "a b c d e f a b c d e f")), n = 5)
    val (nTok, nRem, _) = out(1L)
    assert(nTok == 12)
    // the second a..f block (6 tokens) is covered by repeated windows
    assert(nRem == 6, s"removed $nRem")
  }

  test("unique text is untouched and digest matches the identity") {
    val out = run(Seq((1L, "entirely unique words never repeated")))
    val (nTok, nRem, digest) = out(1L)
    assert(nTok == 5 && nRem == 0)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("entirely unique words never repeated".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest == want)
  }

  test("docs shorter than the window never match anything") {
    val out = run(Seq((1L, "tiny doc"), (2L, "tiny doc")))
    assert(out(1L)._2 == 0 && out(2L)._2 == 0,
      "sub-window docs have no n-grams to collide on")
  }
}
