package graft.sources

/** Minimal parser for NCBI-style ASN.1 *text* notation — the format of
  * the reference's raw PubMed page blobs. The reference delegated this
  * to an absent external module (`asn1.to_json` / `asn1.get_abstracts`,
  * SURVEY.md §0); the observable contract is reconstructed from its call
  * sites (spark-pubmed-jsons/job_pubmed_jsons.py:39,
  * spark-pubmed-word-count/word_count.py:43-50): whole file -> one
  * record per Pubmed entry with pmid and optional abstract.
  *
  * Grammar (ASN.1 value notation subset): `Name ::= { ... }` entries;
  * braces contain either `ident value` members or a value list; strings
  * are double-quoted with doubled-quote escapes; numbers are integral;
  * bare identifiers are enum atoms.
  */
object Asn1 {

  sealed trait Value
  final case class Obj(fields: Map[String, Value], items: Seq[Value]) extends Value
  final case class Str(s: String) extends Value
  final case class Num(n: Long) extends Value
  final case class Atom(s: String) extends Value

  final case class Article(pmid: Long, abstractText: Option[String])

  private final class Cursor(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def skipWs(): Unit =
      while (!eof && (peek.isWhitespace || peek == ',')) i += 1
    def string(): Str = { // at opening quote
      i += 1
      val sb = new StringBuilder
      var done = false
      while (!done && !eof) {
        val c = s.charAt(i)
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { sb += '"'; i += 2 }
          else { i += 1; done = true }
        } else { sb += c; i += 1 }
      }
      Str(sb.toString)
    }
    def word(): String = {
      val start = i
      while (!eof && (peek.isLetterOrDigit || peek == '-' || peek == '_' ||
        peek == '.')) i += 1
      s.substring(start, i)
    }
  }

  private def parseValue(c: Cursor): Value = {
    c.skipWs()
    c.peek match {
      case '{' => parseBody(c)
      case '"' => c.string()
      case ch if ch.isDigit || ch == '-' =>
        val w = c.word()
        w.toLongOption.map(Num).getOrElse(Atom(w))
      case _ =>
        val w = c.word()
        Atom(w)
    }
  }

  private def parseBody(c: Cursor): Obj = { // at '{'
    c.i += 1
    var fields = Map.empty[String, Value]
    var items = Vector.empty[Value]
    var done = false
    while (!done) {
      c.skipWs()
      if (c.eof || c.peek == '}') { if (!c.eof) c.i += 1; done = true }
      else if (c.peek == '{' || c.peek == '"' || c.peek.isDigit) {
        items :+= parseValue(c) // positional list element
      } else {
        val name = c.word()
        c.skipWs()
        if (c.eof || c.peek == '}' || c.peek == ',')
          items :+= Atom(name) // bare enum atom in a list
        else {
          val v = parseValue(c)
          fields += name -> v
        }
      }
    }
    Obj(fields, items)
  }

  /** Parse all `Something ::= { ... }` entries in a file's content. */
  def parseEntries(content: String): Seq[(String, Obj)] = {
    val out = Vector.newBuilder[(String, Obj)]
    var idx = content.indexOf("::=")
    while (idx >= 0) {
      // O(line) name extraction: everything between the last newline and
      // the '::=' (covers the no-newline-prefix case via -1 branch too).
      val name = content.lastIndexOf('\n', idx) match {
        case -1 => content.substring(0, idx).trim
        case n => content.substring(n + 1, idx).trim
      }
      val brace = content.indexOf('{', idx)
      if (brace >= 0) {
        val c = new Cursor(content)
        c.i = brace
        val obj = parseBody(c)
        out += ((name, obj))
        idx = content.indexOf("::=", c.i)
      } else idx = -1
    }
    out.result()
  }

  /** Article extraction — the `asn1.get_abstracts` contract
    * (word_count.py:43-50: keys are pmids, values are abstracts).
    */
  def articles(content: String): Seq[Article] =
    parseEntries(content).flatMap { case (_, obj) =>
      val pmid = obj.fields.get("pmid").collect { case Num(n) => n }
      pmid.map { id =>
        val abs = obj.fields.get("medent").collect { case m: Obj =>
          m.fields.get("abstract").collect { case Str(s) => s }
        }.flatten
        Article(id, abs)
      }
    }
}
