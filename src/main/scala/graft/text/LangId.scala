package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Character-trigram language identification — the standard n-gram
  * profile heuristic (Cavnar & Trenkle style), dependency-free. Profiles
  * are built from small embedded seed texts; scoring is cosine over
  * trigram counts. Deterministic; meant as the cheap first-pass lang
  * filter of a corpus pipeline, not a SOTA classifier.
  */
object LangId {

  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog this is a test " +
      "sentence with common english words which the system can score and " +
      "that should be enough for simple identification of english text"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund dies " +
      "ist ein beispielsatz mit haeufigen deutschen woertern welche das " +
      "system bewerten kann und das sollte fuer eine einfache erkennung " +
      "von deutschem text genuegen"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux " +
      "ceci est une phrase de test avec des mots francais courants que le " +
      "systeme peut evaluer et cela devrait suffire pour une " +
      "identification simple du texte francais"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso esta es " +
      "una frase de prueba con palabras comunes en espanol que el sistema " +
      "puede evaluar y eso deberia bastar para una identificacion simple " +
      "del texto espanol"),
    "zh" -> ("zhe shi yi ge yong lai ce shi de ju zi bao han chang jian de " +
      "han yu pin yin ci yu xi tong ke yi ping gu zhe xie nei rong zu gou " +
      "jian dan de shi bie zhong wen wen ben"))

  private def trigramCounts(s: String): collection.Map[String, Int] = {
    val clean = s.toLowerCase.replaceAll("[^a-z ]", " ").replaceAll("\\s+", " ")
    if (clean.length < 3) Map.empty
    else {
      // single pass with a mutable map — sliding+groupBy allocated a
      // Seq per trigram occurrence and dominated the corpus scan
      val m = new collection.mutable.HashMap[String, Int]()
      var i = 0
      while (i + 3 <= clean.length) {
        val g = clean.substring(i, i + 3)
        m.update(g, m.getOrElse(g, 0) + 1)
        i += 1
      }
      m
    }
  }

  private val profiles: Map[String, (collection.Map[String, Int], Double)] =
    seeds.map { case (lang, text) =>
      val c = trigramCounts(text)
      lang -> (c, math.sqrt(c.values.map(v => v.toDouble * v).sum))
    }

  /** Most-likely language code by trigram cosine; "und" (undetermined)
    * when the text has no scorable trigrams.
    */
  def detect(text: String): String = {
    val c = trigramCounts(if (text == null) "" else text)
    if (c.isEmpty) "und"
    else {
      val n = math.sqrt(c.values.map(v => v.toDouble * v).sum)
      profiles
        .map { case (lang, (p, pn)) =>
          val dotp = c.iterator.map { case (g, v) =>
            v.toDouble * p.getOrElse(g, 0).toDouble }.sum
          (lang, dotp / (n * pn))
        }
        .toSeq.sortBy { case (lang, score) => (-score, lang) }
        .head._1
    }
  }

  private val detectUdf = udf((s: String) => detect(s))

  def langOf(text: Column): Column = detectUdf(text)

  /** (lang, trigram, count) profile rows — the oracle-generation seam:
    * every quantity in [[detect]] is derived from integer trigram
    * counts (dot products and squared norms are exact in doubles, so
    * sqrt/divide are bit-deterministic across engines), which lets the
    * DuckDB oracle rebuild the identical scores from these rows.
    */
  private[graft] def profileRows: Seq[(String, String, Int)] =
    profiles.toSeq.sortBy(_._1).flatMap { case (l, (c, _)) =>
      c.toSeq.sortBy(_._1).map { case (g, v) => (l, g, v) }
    }
}
