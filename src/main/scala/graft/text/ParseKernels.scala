package graft.text

import java.util.Locale
import java.util.regex.Pattern

/** LLM-output parsing kernels — answer/evidence extraction, refusal
  * detection, fusion parsing — replicating the reference's observable
  * behavior (file:line cites into `/root/reference/code/`).
  */
object ParseKernels {

  /** Parsed prediction: reject flag + answer + evidence. */
  final case class Parsed(reject: Boolean, answer: String, evidence: String)

  private val HashSpan = Pattern.compile("##(.*?)##")

  /** `get_answer_from_text` (`utils.py:277-283`): delete all `##...##`
    * spans, strip. */
  def answerFromText(sentence: String): String =
    HashSpan.matcher(sentence).replaceAll("").strip()

  /** `get_evidence_from_text` (`utils.py:248-274`): last `##...##` group;
    * else collect 9-char `Passage-N` slices (deduped — the reference uses
    * a Python set whose order is nondeterministic; we sort for
    * determinism, a documented deviation per SURVEY §2.4 quirk 6); else a
    * single 9-char slice; else the whole text.
    */
  def evidenceFromText(sentence: String): String = {
    val m = HashSpan.matcher(sentence)
    var last: String = null
    while (m.find()) last = m.group(1)
    if (last != null) return last.strip()

    var cnt = 0
    var p = sentence.indexOf("Passage-")
    while (p >= 0) { cnt += 1; p = sentence.indexOf("Passage-", p + 8) }

    if (cnt > 1) {
      val slices = scala.collection.mutable.ArrayBuffer.empty[String]
      var startIndex = 0
      var i = 0
      var break = false
      while (i < cnt && !break) {
        val idx = sentence.indexOf("Passage-", startIndex)
        // evi_index > -1 and evi_index + 9 < len(sentence) - start_index
        if (idx > -1 && (idx - startIndex) + 9 < sentence.length - startIndex) {
          slices += sentence.substring(idx, idx + 9)
          startIndex = idx + 9
        } else break = true
        i += 1
      }
      slices.distinct.sorted.mkString(", ")
    } else {
      val idx = sentence.indexOf("Passage-")
      if (idx > -1 && idx + 9 < sentence.length) sentence.substring(idx, idx + 9)
      else sentence
    }
  }

  /** `extract_ans_evi` (`utils.py:222-245`): strip `"Answer: "`; when
    * `"Evidence: "` is present, the answer is the text before the first
    * occurrence and the evidence the text after the last (greedy regex).
    */
  def extractAnsEvi(text0: String): (String, String) = {
    val text = text0.replace("Answer: ", "")
    val (ansRaw, eviRaw) =
      if (text.contains("Evidence: "))
        (text.replaceAll("Evidence: (.*)", ""), text.replaceAll("(.*)Evidence: ", ""))
      else (text, text)
    val ans = answerFromText(ansRaw)
    val evi = evidenceFromText(eviRaw)
    (ans.strip(), evi.strip())
  }

  /** `deal_prediction_with_evidence` (`utils.py:202-219`): null ⇒ reject
    * with null answer/evidence; strip a leading `answer:` prefix
    * (case-insensitive); refusal detection over the 24 marker phrases
    * (token-wise); newlines to spaces; then answer/evidence split.
    */
  def dealPrediction(pred0: String): Parsed = {
    if (pred0 == null) return Parsed(reject = true, null, null)
    var pred = pred0
    if (pred.toLowerCase(Locale.ROOT).startsWith("answer:"))
      pred = pred.substring(7)
    val reject = TextKernels.tokensContain(TextKernels.RefusalMarkers, pred)
    pred = pred.replace("\n", " ")
    val (ans, evi) = extractAnsEvi(pred)
    Parsed(reject, ans, evi)
  }

  /** `deal_fusion` (`utils.py:368-378`): the committed `$$(.+)$$` regex can
    * never match (unescaped `$`), so the live semantics are a plain
    * substring test for "keep" (SURVEY §2.4 quirk 1).
    */
  def dealFusion(sentence: String): String =
    if (sentence != null && sentence.contains("keep")) "keep" else "discard"

  private val ProbFull = Pattern.compile("\\d+\\.\\d+")
  private val ProbInt = Pattern.compile("\\d+\\.")

  /** `deal_fusion_probability` (`utils.py:381-393`): strip a
    * `probability: ` prefix, first `\d+\.\d+` match, else first `\d+\.`,
    * else 0.0. (The reference crashes on None input; we map it to 0.0.)
    */
  def dealFusionProbability(text0: String): Double = {
    if (text0 == null) return 0.0
    val text =
      if (text0.toLowerCase(Locale.ROOT).startsWith("probability: ")) text0.substring(13)
      else text0
    val m1 = ProbFull.matcher(text)
    if (m1.find()) m1.group().toDouble
    else {
      val m2 = ProbInt.matcher(text)
      if (m2.find()) m2.group().toDouble else 0.0
    }
  }

  /** `str2paras` (`utils.py:342-349`, dead in the reference; kept as a
    * text-lib utility): split on newlines, drop blanks, prefix ": ". */
  def str2paras(s: String): Seq[String] =
    if (s == null) null
    else s.split("\n", -1).iterator.filter(_.strip().nonEmpty).map(": " + _).toSeq

  /** `Tokens.ngrams` semantics (`utils.py:83-108`, dead in the reference;
    * kept as a text-lib utility): all n-grams of length 1..n as
    * space-joined strings. */
  def ngrams(tokens: Seq[String], n: Int): Seq[String] =
    (for {
      s <- tokens.indices
      e <- (s + 1) to math.min(s + n, tokens.length)
    } yield tokens.slice(s, e).mkString(" "))
}
