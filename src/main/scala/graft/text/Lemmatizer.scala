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

  /** Irregular plurals: the standard English irregulars plus the
    * f/fe- and Latin/Greek-plural classes a dictionary-less rule set
    * cannot decide (wolves->wolf but waves->wave; all dictionary-
    * validated in WordNet, table-driven here). Curated toward the
    * biomedical vocabulary the reference's corpus carries
    * (metastases, ganglia, mitochondria, ...).
    */
  private val nounExceptions = Map(
    "men" -> "man", "women" -> "woman", "children" -> "child",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "lice" -> "louse", "oxen" -> "ox",
    "data" -> "datum", "criteria" -> "criterion", "phenomena" -> "phenomenon",
    "analyses" -> "analysis", "diagnoses" -> "diagnosis",
    "hypotheses" -> "hypothesis", "theses" -> "thesis",
    "indices" -> "index", "matrices" -> "matrix", "appendices" -> "appendix",
    "bacteria" -> "bacterium", "fungi" -> "fungus", "nuclei" -> "nucleus",
    "stimuli" -> "stimulus", "larvae" -> "larva", "foci" -> "focus",
    // f/fe plurals (no safe "ves" rule exists: waves->wave)
    "wolves" -> "wolf", "knives" -> "knife", "leaves" -> "leaf",
    "lives" -> "life", "wives" -> "wife", "halves" -> "half",
    "calves" -> "calf", "shelves" -> "shelf", "thieves" -> "thief",
    "loaves" -> "loaf", "scarves" -> "scarf", "elves" -> "elf",
    "selves" -> "self", "hooves" -> "hoof",
    // Latin/Greek plurals (biomedical-heavy)
    "metastases" -> "metastasis", "prognoses" -> "prognosis",
    "neuroses" -> "neurosis", "psychoses" -> "psychosis",
    "oases" -> "oasis", "crises" -> "crisis",
    "parentheses" -> "parenthesis", "syntheses" -> "synthesis",
    "ganglia" -> "ganglion", "mitochondria" -> "mitochondrion",
    "spectra" -> "spectrum", "media" -> "medium", "sera" -> "serum",
    "strata" -> "stratum", "curricula" -> "curriculum",
    "memoranda" -> "memorandum", "ova" -> "ovum", "genera" -> "genus",
    "corpora" -> "corpus", "phyla" -> "phylum", "taxa" -> "taxon",
    "alumni" -> "alumnus", "radii" -> "radius", "cacti" -> "cactus",
    "vertebrae" -> "vertebra", "formulae" -> "formula",
    "apices" -> "apex", "vertices" -> "vertex", "vortices" -> "vortex",
    "codices" -> "codex",
    // round-6 growth (all from the public WordNet noun.exc list):
    // -a/-ae Latin feminines
    "alumnae" -> "alumna", "antennae" -> "antenna", "nebulae" -> "nebula",
    "pupae" -> "pupa", "algae" -> "alga", "scapulae" -> "scapula",
    "fistulae" -> "fistula", "maxillae" -> "maxilla",
    "sequelae" -> "sequela", "fasciae" -> "fascia",
    "conjunctivae" -> "conjunctiva", "placentae" -> "placenta",
    // -um/-a and -on/-a neuters (anatomy-heavy)
    "addenda" -> "addendum", "errata" -> "erratum", "atria" -> "atrium",
    "septa" -> "septum", "cilia" -> "cilium", "flagella" -> "flagellum",
    "epithelia" -> "epithelium", "endothelia" -> "endothelium",
    "cerebella" -> "cerebellum", "labia" -> "labium",
    // -us/-i masculines
    "octopi" -> "octopus", "syllabi" -> "syllabus",
    "termini" -> "terminus", "emboli" -> "embolus",
    "thrombi" -> "thrombus", "bronchi" -> "bronchus",
    "glomeruli" -> "glomerulus", "bacilli" -> "bacillus",
    "villi" -> "villus",
    // -osis/-oses (the "ses"->drop-2 rule yields "-os", not "-osis")
    "stenoses" -> "stenosis", "thromboses" -> "thrombosis",
    "fibroses" -> "fibrosis", "necroses" -> "necrosis",
    "mitoses" -> "mitosis", "meioses" -> "meiosis",
    "scleroses" -> "sclerosis", "cirrhoses" -> "cirrhosis",
    "symbioses" -> "symbiosis", "homeostases" -> "homeostasis",
    "apoptoses" -> "apoptosis", "prostheses" -> "prosthesis",
    "anastomoses" -> "anastomosis", "emphases" -> "emphasis",
    // -ix/-ex -> -ices, -is/-es stragglers, misc irregulars
    "helices" -> "helix", "cervices" -> "cervix", "varices" -> "varix",
    "cortices" -> "cortex", "thoraces" -> "thorax", "testes" -> "testis",
    "brethren" -> "brother", "femora" -> "femur")

  private val verbExceptions = Map(
    "is" -> "be", "are" -> "be", "was" -> "be", "were" -> "be",
    "been" -> "be", "being" -> "be", "am" -> "be",
    "has" -> "have", "had" -> "have", "having" -> "have",
    "does" -> "do", "did" -> "do", "done" -> "do",
    "went" -> "go", "gone" -> "go", "made" -> "make", "said" -> "say",
    "found" -> "find", "saw" -> "see", "seen" -> "see",
    "took" -> "take", "taken" -> "take", "gave" -> "give", "given" -> "give",
    "showed" -> "show", "shown" -> "show", "used" -> "use", "using" -> "use",
    // common strong verbs (ablaut / -ought / -aught classes have no
    // productive rule)
    "came" -> "come", "knew" -> "know", "known" -> "know",
    "grew" -> "grow", "grown" -> "grow", "threw" -> "throw",
    "thrown" -> "throw", "drew" -> "draw", "drawn" -> "draw",
    "flew" -> "fly", "flown" -> "fly",
    "brought" -> "bring", "bought" -> "buy", "thought" -> "think",
    "taught" -> "teach", "caught" -> "catch", "sought" -> "seek",
    "fought" -> "fight",
    "held" -> "hold", "kept" -> "keep", "left" -> "leave",
    "lost" -> "lose", "met" -> "meet", "paid" -> "pay", "ran" -> "run",
    "sold" -> "sell", "told" -> "tell", "sat" -> "sit",
    "spoke" -> "speak", "spoken" -> "speak", "spent" -> "spend",
    "stood" -> "stand", "understood" -> "understand",
    "wrote" -> "write", "written" -> "write",
    "began" -> "begin", "begun" -> "begin", "broke" -> "break",
    "broken" -> "break", "chose" -> "choose", "chosen" -> "choose",
    "ate" -> "eat", "eaten" -> "eat", "fell" -> "fall",
    "fallen" -> "fall", "felt" -> "feel", "got" -> "get",
    "gotten" -> "get", "heard" -> "hear", "hid" -> "hide",
    "hidden" -> "hide", "led" -> "lead", "meant" -> "mean",
    "rose" -> "rise", "risen" -> "rise", "sang" -> "sing",
    "sung" -> "sing", "sent" -> "send", "slept" -> "sleep",
    "swam" -> "swim", "swum" -> "swim", "wore" -> "wear",
    "worn" -> "wear", "won" -> "win", "built" -> "build",
    "became" -> "become", "begat" -> "beget", "bound" -> "bind",
    "bred" -> "breed", "fed" -> "feed", "bled" -> "bleed",
    "arose" -> "arise", "arisen" -> "arise",
    // round-6 growth (all from the public WordNet verb.exc list);
    // forms that are ALSO dictionary lemmas of another verb (lay,
    // wound, saw, bore...) are deliberately absent — NLTK would return
    // them unchanged, and so do our rules
    "borne" -> "bear", "born" -> "bear",
    "bit" -> "bite", "bitten" -> "bite",
    "blew" -> "blow", "blown" -> "blow",
    "clung" -> "cling", "crept" -> "creep", "dealt" -> "deal",
    "dug" -> "dig", "drank" -> "drink", "drunk" -> "drink",
    "drove" -> "drive", "driven" -> "drive",
    "forbade" -> "forbid", "forbidden" -> "forbid",
    "forgot" -> "forget", "forgotten" -> "forget",
    "froze" -> "freeze", "frozen" -> "freeze",
    "hung" -> "hang", "knelt" -> "kneel", "laid" -> "lay",
    "lain" -> "lie", "lent" -> "lend", "lit" -> "light",
    "rang" -> "ring", "rung" -> "ring",
    "rode" -> "ride", "ridden" -> "ride",
    "sank" -> "sink", "sunk" -> "sink",
    "shook" -> "shake", "shaken" -> "shake", "shone" -> "shine",
    "shot" -> "shoot", "shrank" -> "shrink", "shrunk" -> "shrink",
    "slid" -> "slide", "spun" -> "spin",
    "sprang" -> "spring", "sprung" -> "spring",
    "stole" -> "steal", "stolen" -> "steal",
    "stuck" -> "stick", "stung" -> "sting", "struck" -> "strike",
    "strove" -> "strive", "striven" -> "strive",
    "swore" -> "swear", "sworn" -> "swear", "swept" -> "sweep",
    "swung" -> "swing", "tore" -> "tear", "torn" -> "tear",
    "woke" -> "wake", "woken" -> "wake", "wept" -> "weep",
    "withdrew" -> "withdraw", "withdrawn" -> "withdraw",
    "underwent" -> "undergo", "undergone" -> "undergo",
    "overcame" -> "overcome", "upheld" -> "uphold",
    // vowel+at e-droppers: same surface shape as treat/treated, which
    // keeps its bare stem — only a dictionary separates them
    "created" -> "create", "creates" -> "create", "creating" -> "create")

  private val adjExceptions = Map(
    "better" -> "good", "best" -> "good", "worse" -> "bad", "worst" -> "bad",
    "further" -> "far", "furthest" -> "far", "farther" -> "far",
    "farthest" -> "far",
    // -le adjectives whose stem loses the e ambiguously
    "simpler" -> "simple", "simplest" -> "simple",
    "abler" -> "able", "ablest" -> "able",
    "gentler" -> "gentle", "gentlest" -> "gentle",
    // round-6 growth (WordNet adj.exc)
    "elder" -> "old", "eldest" -> "old",
    "subtler" -> "subtle", "subtlest" -> "subtle",
    "nobler" -> "noble", "noblest" -> "noble",
    "idler" -> "idle", "idlest" -> "idle",
    "feebler" -> "feeble", "feeblest" -> "feeble")

  private val vowels = "aeiou".toSet

  /** Exception-table rows — the oracle-generation seam: the irregular
    * maps bake into the DuckDB oracle as VALUES tables; the suffix
    * rules ([[noun]]/[[verb]]/[[adjective]]/fixStem) are plain CASE
    * logic there.
    */
  private[graft] def nounExceptionRows: Seq[(String, String)] =
    nounExceptions.toSeq.sorted
  private[graft] def verbExceptionRows: Seq[(String, String)] =
    verbExceptions.toSeq.sorted
  private[graft] def adjExceptionRows: Seq[(String, String)] =
    adjExceptions.toSeq.sorted

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
    * final consonant (running -> run), then restore the dropped final
    * e where the stem shape makes it decidable without a dictionary:
    *  - stems ending c/g/v/z (larg -> large, analyz -> analyze);
    *  - 3-letter consonant-vowel-consonant stems (hop -> hope,
    *    wid -> wide, lat -> late, mak -> make) — longer CVC stems are
    *    NOT restored (open, edit, iron must stay bare; this is where
    *    dictionary-less morphology is genuinely undecidable);
    *  - consonant+"at"/"ut" stems of length >= 5 (generat -> generate,
    *    comput -> compute — the Latinate verb class scientific prose
    *    leans on; vowel+at stems like treat are left alone).
    *
    * Documented divergence-from-NLTK classes (NLTK validates every
    * candidate against the WordNet dictionary, we cannot):
    *  1. mid-length CVC e-droppers lemmatize bare ("decided" ->
    *     "decid", not "decide" — unless c/g/v/z or at/ut catches them);
    *  2. stems that END in a double consonant lose it ("added" ->
    *     "ad") because doubling is indistinguishable from inflection;
    *  3. rare consonant+at verbs over-restore ("combated" ->
    *     "combate");
    *  4. out-of-table irregulars fall through to the suffix rules.
    */
  private def fixStem(s: String): String = {
    def cons(c: Char) = !vowels(c)
    if (s.length >= 3 && s.last == s(s.length - 2) &&
      cons(s.last) && s.last != 'l' && s.last != 's') s.dropRight(1)
    else if (s.length >= 3 && "cgvz".contains(s.last) &&
      s(s.length - 2) != 'n') s + "e" // larg->large but belong stays
    else if (s.length == 3 && cons(s.last) && !"wxy".contains(s.last) &&
      vowels(s(1)) && cons(s(0))) s + "e" // hop->hope
    else if (s.length >= 5 && (s.endsWith("at") || s.endsWith("ut")) &&
      cons(s(s.length - 3))) s + "e" // generat->generate
    else s
  }

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
