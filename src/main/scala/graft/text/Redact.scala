package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: a declared, ordered rule chain
  * of (regex -> replacement token), applied as stacked codegen'd
  * `regexp_replace` calls — one narrow projection, no UDF, no shuffle.
  * At 100 TB this runs at scan speed inside whole-stage codegen and
  * composes with any downstream operator.
  *
  * Rule order is part of the contract (an email contains digits and
  * dots, so it must be struck before the looser IP/phone patterns can
  * chew on its fragments). Patterns stick to the regex subset with
  * identical semantics in Java regex and RE2, so the same rule text
  * drives both the engine and external audits.
  */
object Redact {

  /** (name, pattern, replacement) — name keys the per-rule hit count. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default web-corpus PII rules, most-specific first. */
  val piiRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    Rule("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** The text column with every rule applied in order. */
  def redact(text: Column, rules: Seq[Rule] = piiRules): Column =
    rules.foldLeft(text) { (c, r) =>
      regexp_replace(c, r.pattern, r.replacement)
    }

  /** Hit count for one rule against the ORIGINAL text (counts reflect
    * the pre-redaction document, independent of rule order).
    */
  def hits(text: Column, rule: Rule): Column =
    size(regexp_extract_all(text, lit(rule.pattern), lit(0))).cast("long")
}
