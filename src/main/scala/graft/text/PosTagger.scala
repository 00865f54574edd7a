package graft.text

/** Rule-based Penn-Treebank-style POS tagger: closed-class lexicon +
  * suffix heuristics, defaulting to NN. Deterministic and dependency-free
  * (the reference used nltk.pos_tag; extract_kw...py:67-69). The tag map
  * to WordNet classes mirrors extract_kw...py:52-63 (J/V/N/R -> a/v/n/r,
  * else none).
  */
object PosTagger {

  private val lexicon: Map[String, String] = {
    def m(tag: String, ws: String) = ws.split(' ').map(_ -> tag)
    (m("DT", "a an the this that these those each every some any no all both") ++
      m("IN", "of in on at by for with from into onto during through between " +
        "against about above below under over after before while until as if " +
        "because although though since upon within without") ++
      m("CC", "and or but nor so yet") ++
      m("PRP", "i you he she it we they me him her us them") ++
      m("PRP$", "my your his its our their") ++
      m("MD", "can could may might must shall should will would") ++
      m("VB", "be do have go make take give show use find see say get") ++
      m("VBZ", "is does has") ++
      m("VBP", "are do have") ++
      m("VBD", "was were did had went made said found saw took gave showed") ++
      m("VBN", "been done gone made found seen taken given shown used") ++
      m("RB", "not very also however moreover therefore often never always " +
        "well more most less least here there then now") ++
      m("WDT", "which what whatever") ++
      m("WP", "who whom whoever") ++
      m("TO", "to") ++
      m("EX", "there")).toMap
  }

  /** (word, tag) lexicon rows — the oracle-generation seam (the
    * LangId.profileRows pattern): the closed-class lexicon bakes into
    * the DuckDB oracle as a VALUES table; the suffix heuristics are
    * plain CASE logic there.
    */
  private[graft] def lexiconRows: Seq[(String, String)] = lexicon.toSeq.sorted

  /** Tag one token (context-free rules). */
  def tagWord(w: String): String = {
    val lw = w.toLowerCase
    lexicon.getOrElse(lw, {
      if (w.isEmpty) "NN"
      else if (!w.exists(_.isLetter)) "CD"
      else if (lw.endsWith("ly")) "RB"
      else if (lw.endsWith("ing") && lw.length > 4) "VBG"
      else if (lw.endsWith("ed") && lw.length > 3) "VBN"
      else if ((lw.endsWith("ous") || lw.endsWith("ful") || lw.endsWith("ive") ||
        lw.endsWith("able") || lw.endsWith("ible") || lw.endsWith("al") ||
        lw.endsWith("ic") || lw.endsWith("ent")) && lw.length > 4) "JJ"
      else if (lw.endsWith("s") && !lw.endsWith("ss") && lw.length > 3) "NNS"
      else "NN"
    })
  }

  def tag(tokens: Seq[String]): Seq[(String, String)] =
    tokens.map(t => (t, tagWord(t)))

  /** Penn -> WordNet class (extract_kw...py:52-63). */
  def toWordnet(penn: String): Option[Char] = penn.headOption match {
    case Some('J') => Some('a')
    case Some('V') => Some('v')
    case Some('N') => Some('n')
    case Some('R') => Some('r')
    case _ => None
  }
}
