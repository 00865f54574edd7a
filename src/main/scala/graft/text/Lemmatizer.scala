package graft.text

/** Small English lemmatizer: WordNet-morphy-style suffix rules plus an
  * irregular-form exception table. No external model/dictionary (offline
  * JVM constraint, SURVEY.md §7 "what's hard"); acceptance is the
  * reference's golden spec ("publications"->"publication", "men"->"man",
  * reference: spark-pubmed-word-count/README.md:7-15), not full WordNet
  * parity.
  *
  * Mirrors the reference's two call shapes:
  *  - v1: POS-less noun lemmatization (word_count.py:36-37,62)
  *  - v2: POS-aware with fallthrough to the raw token when the Penn tag
  *    has no WordNet class (extract_keywords_from_all_abstracts.py:70-77)
  */
object Lemmatizer {

  private val nounExceptions = Map(
    "men" -> "man", "women" -> "woman", "children" -> "child",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "lice" -> "louse", "oxen" -> "ox",
    "data" -> "datum", "criteria" -> "criterion", "phenomena" -> "phenomenon",
    "analyses" -> "analysis", "diagnoses" -> "diagnosis",
    "hypotheses" -> "hypothesis", "theses" -> "thesis",
    "indices" -> "index", "matrices" -> "matrix", "appendices" -> "appendix",
    "bacteria" -> "bacterium", "fungi" -> "fungus", "nuclei" -> "nucleus",
    "stimuli" -> "stimulus", "larvae" -> "larva", "foci" -> "focus")

  private val verbExceptions = Map(
    "is" -> "be", "are" -> "be", "was" -> "be", "were" -> "be",
    "been" -> "be", "being" -> "be", "am" -> "be",
    "has" -> "have", "had" -> "have", "having" -> "have",
    "does" -> "do", "did" -> "do", "done" -> "do",
    "went" -> "go", "gone" -> "go", "made" -> "make", "said" -> "say",
    "found" -> "find", "saw" -> "see", "seen" -> "see",
    "took" -> "take", "taken" -> "take", "gave" -> "give", "given" -> "give",
    "showed" -> "show", "shown" -> "show", "used" -> "use", "using" -> "use")

  private val adjExceptions = Map(
    "better" -> "good", "best" -> "good", "worse" -> "bad", "worst" -> "bad",
    "further" -> "far", "furthest" -> "far")

  private val vowels = "aeiou".toSet

  /** Morphy-style noun detachment, longest suffix first. Words shorter
    * than 4 chars pass through (no dictionary to validate against, and
    * short function words like "is"/"gas" would be mangled).
    */
  def noun(w: String): String = nounExceptions.getOrElse(w, {
    if (w.length < 4) w
    else if (w.endsWith("ches") || w.endsWith("shes")) w.dropRight(2)
    else if (w.endsWith("ses") || w.endsWith("xes") || w.endsWith("zes")) w.dropRight(2)
    else if (w.endsWith("ies") && w.length > 4) w.dropRight(3) + "y"
    else if (w.endsWith("ss") || w.endsWith("us") || w.endsWith("is")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w
  })

  /** Restore stem shape after stripping a verb/adj suffix: drop doubled
    * final consonant (running -> run), restore final e on a
    * consonant-vowel-consonant stem (making -> mak -> make).
    */
  private def fixStem(s: String): String =
    if (s.length >= 3 && s.last == s(s.length - 2) &&
      !vowels(s.last) && s.last != 'l' && s.last != 's') s.dropRight(1)
    else if (s.length >= 3 && "cgvz".contains(s.last) &&
      s(s.length - 2) != 'n') s + "e" // larg->large but belong stays
    else s

  def verb(w: String): String = verbExceptions.getOrElse(w, {
    if (w.length < 4) w
    else if (w.endsWith("ies") && w.length > 4) w.dropRight(3) + "y"
    else if (w.endsWith("ing") && w.length > 5) fixStem(w.dropRight(3))
    else if (w.endsWith("ied")) w.dropRight(3) + "y"
    else if (w.endsWith("ed") && w.length > 4) fixStem(w.dropRight(2))
    else if (w.endsWith("es") && w.length > 4) fixStem(w.dropRight(2))
    else if (w.endsWith("ss") || w.endsWith("us") || w.endsWith("is")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w
  })

  def adjective(w: String): String = adjExceptions.getOrElse(w, {
    if (w.length < 5) w
    else if (w.endsWith("est")) fixStem(w.dropRight(3))
    else if (w.endsWith("er")) fixStem(w.dropRight(2))
    else w
  })

  /** POS-aware entry: WordNet class char n/v/a/r; anything else falls
    * through to the raw token (v2 semantics, extract_kw...py:70-77).
    */
  def lemma(w: String, wnPos: Option[Char]): String = wnPos match {
    case Some('n') => noun(w)
    case Some('v') => verb(w)
    case Some('a') => adjective(w)
    case Some('r') => w // adverbs: no rule set, raw token
    case _ => w
  }
}
