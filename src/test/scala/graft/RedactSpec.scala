package graft

import org.apache.spark.sql.functions._

import graft.text.Redact

/** PII redaction rule chain: pattern coverage, rule order, hit counts. */
class RedactSpec extends SparkSpec {

  private def one(text: String): (String, Long, Long, Long) = {
    import spark.implicits._
    val df = Seq(text).toDF("text").select(
      Redact.redact(col("text")).as("r"),
      Redact.hits(col("text"), Redact.piiRules(0)).as("ne"),
      Redact.hits(col("text"), Redact.piiRules(1)).as("ni"),
      Redact.hits(col("text"), Redact.piiRules(2)).as("np"))
    val row = df.collect()(0)
    (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  test("each rule strikes its own pattern") {
    val (r, ne, ni, np) =
      one("mail a.user+tag@sub.example.co.uk from 192.168.0.1 call 555-0199 end")
    assert(r === "mail <EMAIL> from <IP> call <PHONE> end")
    assert((ne, ni, np) === (1L, 1L, 1L))
  }

  test("email is struck before its digit runs can feed looser rules") {
    // the domain contains dotted digit runs an IP rule could chew on
    val (r, _, _, _) = one("x 10.0.0.7@10.0.0.8.example.com y")
    assert(r === "x <EMAIL> y")
  }

  test("clean text passes through with zero hits") {
    val (r, ne, ni, np) = one("just plain words nothing else")
    assert(r === "just plain words nothing else")
    assert((ne, ni, np) === (0L, 0L, 0L))
  }

  test("multiple hits all redact and count") {
    val (r, ne, _, _) = one("a@b.com then c@d.org")
    assert(r === "<EMAIL> then <EMAIL>")
    assert(ne === 2L)
  }
}
