package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.Asn1
import graft.text.{Fingerprint, LangId, Lemmatizer}

/** Property-based invariants (SURVEY.md §5.2 item 4) over the pure
  * engine functions — no SparkSession needed, so hundreds of cases run
  * in milliseconds.
  */
object GraftProps extends Properties("graft") {

  private val word: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  private val sentence: Gen[String] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  // --- lemmatizer ------------------------------------------------------

  property("noun lemma is never empty and never grows except e-restore") =
    forAll(word) { w =>
      val l = Lemmatizer.noun(w)
      l.nonEmpty && l.length <= w.length + 1
    }

  property("lemmatizer is deterministic") = forAll(word) { w =>
    Lemmatizer.noun(w) == Lemmatizer.noun(w) &&
      Lemmatizer.verb(w) == Lemmatizer.verb(w)
  }

  property("sub-4-letter words only change via the exception table") =
    forAll(Gen.stringOfN(3, Gen.alphaLowerChar)) { w =>
      val l = Lemmatizer.noun(w)
      l == w || l != w.dropRight(1) // never bare suffix-stripped
    }

  // --- asn.1 roundtrip -------------------------------------------------

  private val abstractText: Gen[String] = Gen.oneOf(
    sentence,
    sentence.map(s => s"""with "quoted" parts: $s"""),
    sentence.map(s => s + " 100% of 5-FU {braces} , commas"))

  private val article: Gen[(Long, Option[String])] = for {
    pmid <- Gen.choose(1L, 99999999L)
    abs <- Gen.option(abstractText)
  } yield (pmid, abs)

  private def render(arts: Seq[(Long, Option[String])]): String =
    arts.map { case (pmid, abs) =>
      val absField = abs
        .map(a => s"""    abstract "${a.replace("\"", "\"\"")}" ,\n""")
        .getOrElse("")
      s"""Pubmed-entry ::= {
         |  pmid $pmid ,
         |  medent {
         |    em std { year 1999 , month 1 } ,
         |$absField    status ok
         |  }
         |}""".stripMargin
    }.mkString("\n")

  property("asn1 parse inverts rendering (pmids + abstracts)") =
    forAll(Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, article))) { arts =>
      val parsed = Asn1.articles(render(arts))
      parsed.map(_.pmid) == arts.map(_._1) &&
        parsed.map(_.abstractText) == arts.map(_._2)
    }

  // --- winnowing fingerprints -----------------------------------------

  property("identical docs share all fingerprints") = forAll(sentence) { s =>
    Fingerprint.winnow(s) == Fingerprint.winnow(s)
  }

  property("a long shared substring yields a shared fingerprint") =
    forAll(sentence, sentence, sentence) { (prefix, shared0, suffix) =>
      // winnowing guarantee holds for normalized length >= k + w - 1
      val shared = shared0 + " sharedcorematerialxyz " + shared0
      val a = Fingerprint.winnow(prefix + " " + shared)
      val b = Fingerprint.winnow(shared + " " + suffix)
      Prop(a.toSet.intersect(b.toSet).nonEmpty) :| "no shared fingerprint"
    }

  // --- langid ----------------------------------------------------------

  property("langid is deterministic and total") = forAll(sentence) { s =>
    val l = LangId.detect(s)
    l == LangId.detect(s) && l.nonEmpty
  }

  property("langid of empty-ish text is undetermined") =
    forAll(Gen.oneOf("", " ", "1 2 3 !!")) { s =>
      LangId.detect(s) == "und"
    }

  // --- native text expressions (pure compute paths) --------------------

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.graftx.{TextShingles, TextSimHash}

  /** Reference trigram shingles via the regex formulation the DuckDB
    * oracle uses — the native byte-scan must agree on the SET SIZE.
    */
  private def refShingleCount(text: String): Int = {
    val toks = text.toLowerCase.replaceAll("[^a-z]+", " ")
      .trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) 0
    else toks.sliding(3).map(_.mkString(" ")).toSet.size
  }

  private val messyText: Gen[String] = Gen.oneOf(
    sentence,
    sentence.map(s => s"UPPER $s MiXeD, punct!! 123 $s"),
    sentence.map(s => s"héllo wörld $s"), // multi-byte breaks tokens
    Gen.const(""), Gen.const("one two"), Gen.const("a b c a b c a b c"))

  property("native shingles match the regex-reference trigram count") =
    forAll(messyText) { s =>
      val got = TextShingles.compute(UTF8String.fromString(s)).numElements()
      got == refShingleCount(s)
    }

  property("native shingle hashes are sorted strictly increasing") =
    forAll(messyText) { s =>
      val arr = TextShingles.compute(UTF8String.fromString(s)).toLongArray()
      arr.sliding(2).forall(w => w.length < 2 || w(0) < w(1))
    }

  property("native lemmatize_nouns agrees with Lemmatizer.noun per element") =
    forAll(Gen.listOf(word)) { ws =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.graftx.LemmatizeNouns
      val in = new GenericArrayData(
        ws.map(w => UTF8String.fromString(w): Any).toArray)
      val expr = LemmatizeNouns(
        org.apache.spark.sql.catalyst.expressions.Literal(in,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
      val out = expr.lemmaAll(in)
      (0 until out.numElements()).forall { i =>
        out.getUTF8String(i).toString == graft.text.Lemmatizer.noun(ws(i))
      } && out.numElements() == ws.length
    }

  property("simhash: token order and duplication are irrelevant") =
    forAll(sentence) { s =>
      val toks = s.split(" ").toSeq
      val shuffled = scala.util.Random.shuffle(toks).mkString(" ")
      val doubled = (toks ++ toks).mkString(" ")
      val h = TextSimHash.compute(UTF8String.fromString(s))
      h == TextSimHash.compute(UTF8String.fromString(shuffled)) &&
        h == TextSimHash.compute(UTF8String.fromString(doubled))
    }

  property("simhash of token-free text is null") =
    forAll(Gen.oneOf("", "  ", "123 456 !!")) { s =>
      TextSimHash.compute(UTF8String.fromString(s)) == null
    }

  property("minhash bands: empty shingle input yields no band keys") =
    Prop {
      import org.apache.spark.sql.graftx.MinHashBands
      import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      MinHashBands.compute(
        UnsafeArrayData.fromPrimitiveArray(Array.empty[Long]),
        Array.tabulate(64)(_ + 1L), new Array[Long](64),
        16, 4).numElements() == 0
    }

  property("native winnow equals the reference implementation") =
    forAll(messyText) { s =>
      val native = org.apache.spark.sql.graftx.TextWinnow
        .compute(UTF8String.fromString(s), 7, 4).toLongArray().toSeq
      native == Fingerprint.winnow(s)
    }

  // --- kmv bottom-k buffer ---------------------------------------------

  private val hashSeq: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1L << 60))

  property("kmin buffer == sorted distinct take k, any insertion order") =
    forAll(hashSeq, Gen.choose(1, 8)) { (vs, k) =>
      val agg = new graft.operators.KmvSketch.KMinAgg(k)
      val built = vs.foldLeft(agg.zero)(agg.reduce)
      built == vs.distinct.sorted.take(k) &&
        built == scala.util.Random.shuffle(vs).foldLeft(agg.zero)(agg.reduce)
    }

  property("kmin merge is associative and agrees with one-shot build") =
    forAll(hashSeq, hashSeq, hashSeq, Gen.choose(1, 8)) { (a, b, c, k) =>
      val agg = new graft.operators.KmvSketch.KMinAgg(k)
      def build(xs: List[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(build(a), build(b)), build(c))
      val right = agg.merge(build(a), agg.merge(build(b), build(c)))
      left == right && left == build(a ++ b ++ c)
    }
}
