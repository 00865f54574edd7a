package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Lemmatizer

/** Broad inflection golden set (r3 verdict task 6) — well beyond the
  * 7-word reference golden. Expected lemmas follow WordNet-morphy
  * semantics; classes a dictionary-less rule set cannot decide are in
  * the exception tables, and the remaining divergence-from-NLTK
  * classes are documented on Lemmatizer.fixStem and pinned below so a
  * drift is a conscious choice, never an accident.
  */
class LemmatizerSpec extends AnyFunSuite {

  private def all(cases: (String, String)*)(f: String => String): Unit = {
    val bad = cases.collect {
      case (w, want) if f(w) != want => s"$w -> ${f(w)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("regular noun plurals") {
    all("publications" -> "publication", "studies" -> "study",
      "boxes" -> "box", "churches" -> "church", "brushes" -> "brush",
      "genes" -> "gene", "cells" -> "cell", "viruses" -> "virus",
      "waves" -> "wave", "classes" -> "class", "buses" -> "bus",
      "tomatoes" -> "tomatoe", // no -oes rule: documented, morphy has none either
      "proteins" -> "protein")(Lemmatizer.noun)
  }

  test("irregular and Latin/Greek noun plurals (exception table)") {
    all("men" -> "man", "women" -> "woman", "children" -> "child",
      "wolves" -> "wolf", "knives" -> "knife", "leaves" -> "leaf",
      "halves" -> "half", "shelves" -> "shelf",
      "metastases" -> "metastasis", "prognoses" -> "prognosis",
      "ganglia" -> "ganglion", "mitochondria" -> "mitochondrion",
      "spectra" -> "spectrum", "sera" -> "serum", "taxa" -> "taxon",
      "genera" -> "genus", "corpora" -> "corpus", "radii" -> "radius",
      "vertebrae" -> "vertebra", "vertices" -> "vertex",
      "criteria" -> "criterion", "analyses" -> "analysis",
      "crises" -> "crisis", "phyla" -> "phylum")(Lemmatizer.noun)
  }

  test("invariant -ss/-us/-is nouns pass through") {
    all("glass" -> "glass", "status" -> "status", "basis" -> "basis",
      "analysis" -> "analysis", "virus" -> "virus")(Lemmatizer.noun)
  }

  test("regular verb inflections incl. e-restoration classes") {
    all("running" -> "run", "stopped" -> "stop", "sitting" -> "sit",
      "studies" -> "study", "studied" -> "study", "carried" -> "carry",
      "making" -> "make", "hoped" -> "hope", "tuned" -> "tune",
      "generated" -> "generate", "created" -> "create",
      "indicated" -> "indicate", "activated" -> "activate",
      "demonstrated" -> "demonstrate", "computed" -> "compute",
      "distributed" -> "distribute", "contributed" -> "contribute",
      "analyzed" -> "analyze", "derived" -> "derive",
      "treated" -> "treat", "looked" -> "look", "opened" -> "open",
      "edited" -> "edit", "joined" -> "join",
      "walks" -> "walk")(Lemmatizer.verb)
  }

  test("irregular verbs (exception table)") {
    all("went" -> "go", "came" -> "come", "knew" -> "know",
      "brought" -> "bring", "thought" -> "think", "taught" -> "teach",
      "caught" -> "catch", "held" -> "hold", "kept" -> "keep",
      "left" -> "leave", "met" -> "meet", "ran" -> "run",
      "told" -> "tell", "wrote" -> "write", "written" -> "write",
      "began" -> "begin", "broke" -> "break", "chosen" -> "choose",
      "felt" -> "feel", "heard" -> "hear", "led" -> "lead",
      "rose" -> "rise", "sent" -> "send", "worn" -> "wear",
      "won" -> "win", "built" -> "build", "fed" -> "feed",
      "bound" -> "bind", "arose" -> "arise",
      "understood" -> "understand")(Lemmatizer.verb)
  }

  test("round-6 noun exception growth (WordNet noun.exc)") {
    all("alumnae" -> "alumna", "antennae" -> "antenna",
      "nebulae" -> "nebula", "algae" -> "alga",
      "scapulae" -> "scapula", "sequelae" -> "sequela",
      "placentae" -> "placenta", "addenda" -> "addendum",
      "errata" -> "erratum", "atria" -> "atrium", "septa" -> "septum",
      "cilia" -> "cilium", "flagella" -> "flagellum",
      "epithelia" -> "epithelium", "cerebella" -> "cerebellum",
      "syllabi" -> "syllabus", "termini" -> "terminus",
      "emboli" -> "embolus", "thrombi" -> "thrombus",
      "bronchi" -> "bronchus", "glomeruli" -> "glomerulus",
      "bacilli" -> "bacillus", "villi" -> "villus",
      "stenoses" -> "stenosis", "thromboses" -> "thrombosis",
      "fibroses" -> "fibrosis", "necroses" -> "necrosis",
      "mitoses" -> "mitosis", "meioses" -> "meiosis",
      "scleroses" -> "sclerosis", "apoptoses" -> "apoptosis",
      "prostheses" -> "prosthesis", "anastomoses" -> "anastomosis",
      "emphases" -> "emphasis", "homeostases" -> "homeostasis",
      "helices" -> "helix", "cervices" -> "cervix",
      "cortices" -> "cortex", "thoraces" -> "thorax",
      "testes" -> "testis", "brethren" -> "brother",
      "femora" -> "femur")(Lemmatizer.noun)
  }

  test("round-6 verb exception growth (WordNet verb.exc)") {
    // "bore" is deliberately NOT mapped: 'to bore' (drill/tire) is
    // itself a dictionary lemma, the lay/wound/saw exclusion rule
    all("bore" -> "bore", "borne" -> "bear", "born" -> "bear",
      "bitten" -> "bite", "blew" -> "blow", "blown" -> "blow",
      "clung" -> "cling", "crept" -> "creep", "dealt" -> "deal",
      "dug" -> "dig", "drank" -> "drink", "driven" -> "drive",
      "forbidden" -> "forbid", "forgotten" -> "forget",
      "froze" -> "freeze", "frozen" -> "freeze", "hung" -> "hang",
      "laid" -> "lay", "lain" -> "lie", "lit" -> "light",
      "rang" -> "ring", "ridden" -> "ride", "sank" -> "sink",
      "shaken" -> "shake", "shone" -> "shine", "shot" -> "shoot",
      "shrunk" -> "shrink", "slid" -> "slide", "spun" -> "spin",
      "sprung" -> "spring", "stolen" -> "steal", "stuck" -> "stick",
      "struck" -> "strike", "striven" -> "strive", "sworn" -> "swear",
      "swept" -> "sweep", "swung" -> "swing", "torn" -> "tear",
      "woken" -> "wake", "wept" -> "weep",
      "withdrawn" -> "withdraw", "undergone" -> "undergo",
      "overcame" -> "overcome", "upheld" -> "uphold")(Lemmatizer.verb)
    // forms that are also lemmas of other verbs stay untouched (NLTK
    // dictionary-validation parity): lay/saw/wound/found are handled
    // by their own entries or pass through
    assert(Lemmatizer.verb("wound") == "wound")
  }

  test("round-6 adjective exception growth (WordNet adj.exc)") {
    all("elder" -> "old", "eldest" -> "old",
      "subtler" -> "subtle", "subtlest" -> "subtle",
      "nobler" -> "noble", "noblest" -> "noble",
      "idler" -> "idle", "feebler" -> "feeble")(Lemmatizer.adjective)
  }

  test("adjective comparison") {
    all("better" -> "good", "best" -> "good", "worse" -> "bad",
      "worst" -> "bad", "further" -> "far", "farther" -> "far",
      "larger" -> "large", "largest" -> "large", "bigger" -> "big",
      "biggest" -> "big", "safer" -> "safe", "nicer" -> "nice",
      "older" -> "old", "newer" -> "new", "greater" -> "great",
      "simpler" -> "simple", "gentlest" -> "gentle")(Lemmatizer.adjective)
  }

  test("documented divergences from NLTK stay exactly as documented") {
    // class 1: mid-length CVC e-droppers lemmatize bare
    assert(Lemmatizer.verb("decided") == "decid")
    // class 2: stems ending in a real double consonant lose one
    assert(Lemmatizer.verb("added") == "ad")
    // class 3: rare consonant+at verbs over-restore
    assert(Lemmatizer.verb("combated") == "combate")
    // POS-aware entry falls through for unknown POS (v2 semantics)
    assert(Lemmatizer.lemma("running", None) == "running")
    assert(Lemmatizer.lemma("children", Some('n')) == "child")
  }
}
