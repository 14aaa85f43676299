package graft.text

/** Porter stemmer, NLTK-extensions mode.
  *
  * The reference scores ROUGE-L with HuggingFace's rouge metric
  * (`/root/reference/code/utils.py:10,335-339`), which delegates to the
  * public `rouge_score` library; that library stems tokens with NLTK's
  * `PorterStemmer()` in its default NLTK_EXTENSIONS mode. This is a clean
  * re-implementation of that public algorithm (Porter 1980 plus the NLTK
  * deviations: irregular-form pool, <=2-char passthrough, `ies`/`ied`
  * special cases, step-1c consonant condition, `alli` pre-rule, `fulli`
  * and `logi` rules, two-letter CVC acceptance).
  */
object Porter {

  private val Vowels = Set('a', 'e', 'i', 'o', 'u')

  private val pool: Map[String, String] = {
    val irregular = Map(
      "sky" -> List("sky", "skies"),
      "die" -> List("dying"),
      "lie" -> List("lying"),
      "tie" -> List("tying"),
      "news" -> List("news"),
      "inning" -> List("innings", "inning"),
      "outing" -> List("outings", "outing"),
      "canning" -> List("cannings", "canning"),
      "howe" -> List("howe"),
      "proceed" -> List("proceed"),
      "exceed" -> List("exceed"),
      "succeed" -> List("succeed"),
    )
    irregular.flatMap { case (stem, forms) => forms.map(_ -> stem) }
  }

  private def isConsonant(w: String, i: Int): Boolean = {
    val c = w.charAt(i)
    if (Vowels.contains(c)) false
    else if (c == 'y') i == 0 || !isConsonant(w, i - 1)
    else true
  }

  /** m() — the number of VC sequences in the stem. */
  private def measure(stem: String): Int = {
    var m = 0
    var i = 0
    var prevVowel = false
    while (i < stem.length) {
      val cons = isConsonant(stem, i)
      if (cons && prevVowel) m += 1
      prevVowel = !cons
      i += 1
    }
    m
  }

  private def hasPositiveMeasure(stem: String): Boolean = measure(stem) > 0

  private def containsVowel(stem: String): Boolean =
    (0 until stem.length).exists(i => !isConsonant(stem, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** *o — stem ends cvc where the final c is not w, x or y. NLTK also
    * accepts a two-letter vc word (so e.g. "hop"+"e" logic fires on "ho").
    */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    (n >= 3 && isConsonant(w, n - 3) && !isConsonant(w, n - 2) &&
      isConsonant(w, n - 1) && !"wxy".contains(w.charAt(n - 1))) ||
    (n == 2 && !isConsonant(w, 0) && isConsonant(w, 1))
  }

  private case class Rule(suffix: String, repl: String, cond: String => Boolean)
  private val always: String => Boolean = _ => true

  /** First matching suffix wins; if its condition fails the word is
    * returned unchanged (Porter's "longest match" behavior as in NLTK).
    * A suffix of "*d" matches a double consonant and strips one letter.
    */
  private def applyRules(word: String, rules: Seq[Rule]): String = {
    for (r <- rules) {
      if (r.suffix == "*d") {
        if (endsDoubleConsonant(word)) {
          val stem = word.substring(0, word.length - 2)
          return if (r.cond(stem)) stem + r.repl else word
        }
      } else if (word.endsWith(r.suffix)) {
        val stem = word.substring(0, word.length - r.suffix.length)
        return if (r.cond(stem)) stem + r.repl else word
      }
    }
    word
  }

  private def step1a(word: String): String = {
    if (word.endsWith("ies") && word.length == 4)
      return word.substring(0, word.length - 3) + "ie"
    applyRules(word, Seq(
      Rule("sses", "ss", always),
      Rule("ies", "i", always),
      Rule("ss", "ss", always),
      Rule("s", "", always),
    ))
  }

  private def step1b(word: String): String = {
    if (word.endsWith("ied"))
      return if (word.length == 4) word.substring(0, word.length - 3) + "ie"
             else word.substring(0, word.length - 3) + "i"
    if (word.endsWith("eed")) {
      val stem = word.substring(0, word.length - 3)
      return if (measure(stem) > 0) stem + "ee" else word
    }
    var intermediate: String = null
    for (suffix <- Seq("ed", "ing") if intermediate == null) {
      if (word.endsWith(suffix)) {
        val stem = word.substring(0, word.length - suffix.length)
        if (containsVowel(stem)) intermediate = stem
      }
    }
    if (intermediate == null) return word
    val last = intermediate.charAt(intermediate.length - 1)
    applyRules(intermediate, Seq(
      Rule("at", "ate", always),
      Rule("bl", "ble", always),
      Rule("iz", "ize", always),
      Rule("*d", last.toString, _ => !"lsz".contains(last)),
      Rule("", "e", stem => measure(stem) == 1 && endsCvc(stem)),
    ))
  }

  private def step1c(word: String): String =
    applyRules(word, Seq(
      Rule("y", "i", stem => stem.length > 1 && isConsonant(stem, stem.length - 1))
    ))

  private def step2(word: String): String = {
    if (word.endsWith("alli") &&
        hasPositiveMeasure(word.substring(0, word.length - 4)))
      return step2(word.substring(0, word.length - 4) + "al")
    val m = hasPositiveMeasure _
    applyRules(word, Seq(
      Rule("ational", "ate", m), Rule("tional", "tion", m),
      Rule("enci", "ence", m), Rule("anci", "ance", m),
      Rule("izer", "ize", m),
      Rule("bli", "ble", m),
      Rule("alli", "al", m), Rule("entli", "ent", m),
      Rule("eli", "e", m), Rule("ousli", "ous", m),
      Rule("ization", "ize", m), Rule("ation", "ate", m),
      Rule("ator", "ate", m), Rule("alism", "al", m),
      Rule("iveness", "ive", m), Rule("fulness", "ful", m),
      Rule("ousness", "ous", m), Rule("aliti", "al", m),
      Rule("iviti", "ive", m), Rule("biliti", "ble", m),
      Rule("fulli", "ful", m),
      // the 'l' of 'logi' stays with the stem so short stems (geo, theo)
      // behave like longer ones
      Rule("logi", "log", _ => hasPositiveMeasure(word.substring(0, word.length - 3))),
    ))
  }

  private def step3(word: String): String = {
    val m = hasPositiveMeasure _
    applyRules(word, Seq(
      Rule("icate", "ic", m), Rule("ative", "", m), Rule("alize", "al", m),
      Rule("iciti", "ic", m), Rule("ical", "ic", m), Rule("ful", "", m),
      Rule("ness", "", m),
    ))
  }

  private def step4(word: String): String = {
    val m1: String => Boolean = stem => measure(stem) > 1
    applyRules(word, Seq(
      Rule("al", "", m1), Rule("ance", "", m1), Rule("ence", "", m1),
      Rule("er", "", m1), Rule("ic", "", m1), Rule("able", "", m1),
      Rule("ible", "", m1), Rule("ant", "", m1), Rule("ement", "", m1),
      Rule("ment", "", m1), Rule("ent", "", m1),
      Rule("ion", "", stem => measure(stem) > 1 && stem.nonEmpty &&
        (stem.last == 's' || stem.last == 't')),
      Rule("ou", "", m1), Rule("ism", "", m1), Rule("ate", "", m1),
      Rule("iti", "", m1), Rule("ous", "", m1), Rule("ive", "", m1),
      Rule("ize", "", m1),
    ))
  }

  private def step5a(word: String): String = {
    if (word.endsWith("e")) {
      val stem = word.substring(0, word.length - 1)
      if (measure(stem) > 1) return stem
      if (measure(stem) == 1 && !endsCvc(stem)) return stem
    }
    word
  }

  private def step5b(word: String): String =
    applyRules(word, Seq(
      Rule("ll", "l", _ => measure(word.substring(0, word.length - 1)) > 1)
    ))

  def stem(word0: String): String = {
    val word = word0.toLowerCase(java.util.Locale.ROOT)
    pool.get(word) match {
      case Some(s) => s
      case None =>
        if (word.length <= 2) word
        else step5b(step5a(step4(step3(step2(step1c(step1b(step1a(word))))))))
    }
  }
}
