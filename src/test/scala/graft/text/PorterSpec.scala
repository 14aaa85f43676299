package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven checks of the NLTK-mode Porter stemmer (the riskiest
  * parity kernel, SURVEY §7.4.1) against published NLTK PorterStemmer
  * outputs, plus the rouge_score tokenize/LCS/recall chain built on it. */
class PorterSpec extends AnyFunSuite {

  val nltkPairs: Seq[(String, String)] = Seq(
    // NLTK demo vocabulary
    "caresses" -> "caress", "flies" -> "fli", "dies" -> "die",
    "mules" -> "mule", "denied" -> "deni", "died" -> "die",
    "agreed" -> "agre", "owned" -> "own", "humbled" -> "humbl",
    "sized" -> "size", "meeting" -> "meet", "stating" -> "state",
    "itemization" -> "item", "sensational" -> "sensat",
    "traditional" -> "tradit", "reference" -> "refer",
    "colonizer" -> "colon", "plotted" -> "plot",
    // classic Porter-spec pairs (unchanged in NLTK mode)
    "ponies" -> "poni", "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "conflated" -> "conflat", "troubled" -> "troubl",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
    "happy" -> "happi", "relational" -> "relat",
    "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl", "triplicate" -> "triplic",
    "formative" -> "form", "formalize" -> "formal",
    // (the paper's step-3 table shows "electric"; step 4 then strips the
    // m>1 "ic", so the algorithm's final output is "electr")
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good", "revival" -> "reviv",
    "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "effective" -> "effect",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "roll" -> "roll",
    // NLTK irregular pool + short-word passthrough
    "sky" -> "sky", "skies" -> "sky", "dying" -> "die",
    "lying" -> "lie", "tying" -> "tie", "news" -> "news",
    "innings" -> "inning", "proceed" -> "proceed", "exceed" -> "exceed",
    "succeed" -> "succeed", "at" -> "at", "on" -> "on")

  test("Porter stems match NLTK outputs") {
    val bad = nltkPairs.collect {
      case (w, want) if Porter.stem(w) != want => s"$w -> ${Porter.stem(w)} (want $want)"
    }
    assert(bad.isEmpty, s"${bad.size} divergent stems: ${bad.mkString(", ")}")
  }

  test("rougeTokenize: lowercase, non-alnum split, stem only len>3 tokens") {
    assert(TextKernels.rougeTokenize("The cats were Meeting!").toSeq ==
      Seq("the", "cat", "were", "meet"))
    // 3-char tokens pass through unstemmed
    assert(TextKernels.rougeTokenize("ties tie").toSeq == Seq("tie", "tie"))
    assert(TextKernels.rougeTokenize("").isEmpty)
    assert(TextKernels.rougeTokenize("日本語 only 中文").toSeq == Seq("onli"))
  }

  test("lcsLen") {
    assert(TextKernels.lcsLen(Array("a", "b", "c"), Array("a", "c")) == 2)
    assert(TextKernels.lcsLen(Array("a"), Array("b")) == 0)
    assert(TextKernels.lcsLen(Array.empty[String], Array("a")) == 0)
    assert(TextKernels.lcsLen(Array("x", "y", "z"), Array("x", "y", "z")) == 3)
  }

  test("rougeLRecall: LCS/|ref| on stemmed tokens, max over golds") {
    assert(TextKernels.rougeLRecall(Seq("the cat sat"), "the cat sat") == 1.0)
    assert(TextKernels.rougeLRecall(Seq("the cat sat"), "dogs bark") == 0.0)
    // ref "cats sitting here" -> [cat, sit, here]; pred contains [cat, here] in order
    val r = TextKernels.rougeLRecall(Seq("cats sitting here"), "a cat was here")
    assert(math.abs(r - 2.0 / 3.0) < 1e-12)
    assert(TextKernels.rougeLRecall(Seq(""), "x") == 0.0)
    assert(TextKernels.rougeLRecall(Seq("stemming matters"), "stemmed matter") == 1.0)
  }

  test("rougeLRecall reproduces the dual-implementation golden sweep (245 cases)") {
    // tools/make_rouge_cases.py: an INDEPENDENT Python re-implementation
    // of the same published chain (NLTK-mode Porter -> rouge_score
    // tokenize -> LCS recall), run over suffix-adversarial sentence pairs
    // covering every Porter rule class + the irregular pool. The real
    // library is unavailable offline; two independently written
    // implementations agreeing across this sweep is the strongest
    // available check against transcription bugs (SURVEY §7.4 risk #1).
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val src = scala.io.Source.fromFile("src/test/resources/rouge_cases.jsonl", "UTF-8")
    val cases = try src.getLines().filter(_.nonEmpty).map(JsonMethods.parse(_)).toList
      finally src.close()
    assert(cases.size >= 200, s"fixture unexpectedly small: ${cases.size}")
    cases.foreach { c =>
      val refs = (c \ "refs").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
      val pred = (c \ "pred").asInstanceOf[JString].s
      val exp = c \ "exp" match {
        case JDouble(x) => x
        case JInt(x) => x.toDouble
        case other => fail(s"not numeric: $other")
      }
      val got = TextKernels.rougeLRecall(refs, pred)
      assert(math.abs(got - exp) < 1e-9,
        s"refs=${refs.map(_.take(40))} pred=${pred.take(40)}: got $got want $exp")
    }
  }
}
