package graft.text

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

/** Pure-Scala (no Spark) text kernels replicating the reference's scoring
  * primitives. Each function cites the behavior it replicates in
  * `/root/reference/code/`. These back both the Spark UDFs and unit tests.
  */
object TextKernels {

  /** `string.punctuation` — the exact 32 ASCII chars Python strips
    * (`utils.py:298-300`). */
  val Punctuation: Set[Char] = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet

  /** `_normalize_answer` (`utils.py:292-306`): lower -> strip punctuation
    * -> drop articles -> collapse whitespace, in exactly that order
    * (punct strip happens before article removal, so "the." -> "the" ->
    * removed — SURVEY §2.4 quirk 3).
    */
  def normalizeAnswer(s: String): String = {
    if (s == null) return null
    val lowered = s.toLowerCase(Locale.ROOT)
    val noPunct = lowered.filterNot(Punctuation.contains)
    val noArticles = noPunct.replaceAll("(?U)\\b(a|an|the)\\b", " ")
    // " ".join(text.split()) — Python split() is Unicode-whitespace aware
    noArticles.split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** `F1_compute.get_tokens` (`utils.py:314-316`). */
  def f1Tokens(s: String): Array[String] =
    if (s == null || s.isEmpty) Array.empty
    else normalizeAnswer(s).split(" ").filter(_.nonEmpty)

  /** `EM_compute` (`utils.py:309-310`) — exact match after normalization,
    * max over the gold-answer list. Empty list yields 0 (the reference
    * would throw on `max([])`; no caller passes an empty list).
    */
  def emCompute(refs: Seq[String], pred: String): Int = {
    if (pred == null) return 0
    val np = normalizeAnswer(pred)
    if (refs.exists(r => normalizeAnswer(r) == np)) 1 else 0
  }

  /** `F1_compute` (`utils.py:313-332`) — token-bag F1, max over golds.
    * Both-empty ⇒ 1, one-empty ⇒ 0 (SURVEY §2.4 quirk 4).
    */
  def tokenF1(refs: Seq[String], pred: String): Double = {
    val predToks = f1Tokens(pred)
    val predCounts = predToks.groupBy(identity).map { case (k, v) => (k, v.length) }
    def f1One(gold: String): Double = {
      val goldToks = f1Tokens(gold)
      if (goldToks.isEmpty || predToks.isEmpty)
        return if (goldToks.sameElements(predToks)) 1.0 else 0.0
      val goldCounts = goldToks.groupBy(identity).map { case (k, v) => (k, v.length) }
      val numSame = goldCounts.map { case (t, c) =>
        math.min(c, predCounts.getOrElse(t, 0))
      }.sum
      if (numSame == 0) 0.0
      else {
        val precision = numSame.toDouble / predToks.length
        val recall = numSame.toDouble / goldToks.length
        2 * precision * recall / (precision + recall)
      }
    }
    if (refs.isEmpty) 0.0 else refs.map(f1One).max
  }

  /** rouge_score tokenization: lowercase, non-alphanumeric -> space,
    * Porter-stem tokens longer than 3 chars, keep ^[a-z0-9]+$ tokens.
    * (Public `rouge_score.tokenize` behavior, consumed by the reference
    * via the HF rouge metric — `utils.py:335-339`.)
    */
  def rougeTokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    text.toLowerCase(Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ")
      .split("\\s+")
      .map(t => if (t.length > 3) Porter.stem(t) else t)
      .filter(t => t.nonEmpty && t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
  }

  /** Longest-common-subsequence length by DP (O(n*m), two rows). */
  def lcsLen(a: Array[String], b: Array[String]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        cur(j + 1) =
          if (a(i) == b(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(b.length)
  }

  /** `RougeL_compute` (`utils.py:335-339`): ROUGE-L **recall**, stemmed,
    * max over golds. Either side tokenizing to empty ⇒ 0 (rouge_score
    * `_score_lcs` behavior).
    */
  def rougeLRecall(refs: Seq[String], pred: String): Double = {
    val predToks = rougeTokenize(pred)
    def one(gold: String): Double = {
      val goldToks = rougeTokenize(gold)
      if (goldToks.isEmpty || predToks.isEmpty) 0.0
      else lcsLen(goldToks, predToks).toDouble / goldToks.length
    }
    if (refs.isEmpty) 0.0 else refs.map(one).max
  }

  /** `SimpleTokenizer` pattern (`utils.py:148-149`): alphanumeric+marks
    * runs, else any single non-space non-control char; NFD-normalized
    * input, lowercased tokens.
    */
  private val SimpleTokenPattern: Pattern = Pattern.compile(
    "[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]",
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)

  def simpleTokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val nfd = Normalizer.normalize(text, Normalizer.Form.NFD)
    val m = SimpleTokenPattern.matcher(nfd)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group().toLowerCase(Locale.ROOT)
    buf.toArray
  }

  /** `has_answer` (`utils.py:16-199` live path): token-sequence
    * containment — does any answer's token sequence occur contiguously in
    * the text's token sequence? (An answer tokenizing to empty matches
    * trivially, mirroring Python's `range(0, len+1)` loop.)
    */
  def tokensContain(answers: Seq[String], text: String): Boolean = {
    val textToks = simpleTokenize(text)
    answers.exists { a =>
      val ansToks = simpleTokenize(a)
      if (ansToks.isEmpty) true
      else if (ansToks.length > textToks.length) false
      else textToks.sliding(ansToks.length).exists(_.sameElements(ansToks))
    }
  }

  /** The 24 refusal marker phrases (`utils.py:208-211`), matched
    * token-wise via [[tokensContain]]. */
  val RefusalMarkers: Seq[String] = Seq(
    "no specific", "unconfirmed", "uncertain", "unavailable", "sorry",
    "not have access", "no information", "not provide", "no clear",
    "not mentioned", "not mention", "no mention", "no answer", "N/A",
    "unclear", "not clear", "unknown", "partially correct",
    "partially incorrect", "not correct", "cannot determine",
    "cannot answer", "not incorrect", "incomplete")

  /** `match`'s raw-substring has_answer (`utils.py:403-407`) — distinct
    * from [[tokensContain]] (SURVEY §2.4 quirk 2). */
  def substrHasAnswer(refs: Seq[String], pred: String): Boolean =
    pred != null && refs.exists(r => pred.indexOf(r) >= 0)
}
