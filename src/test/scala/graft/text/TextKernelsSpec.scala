package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth extracted by executing the reference's pure kernels
  * (`/root/reference/code/utils.py`) on these exact inputs — every expected
  * value below is the reference's observed output, not a guess. */
class TextKernelsSpec extends AnyFunSuite {
  import TextKernels._

  // _normalize_answer (utils.py:292-306)
  test("normalize: punctuation strip before article removal (quirk 3)") {
    assert(normalizeAnswer("the.") == "")
    assert(normalizeAnswer("The  quick, brown fox!") == "quick brown fox")
    assert(normalizeAnswer("a the an") == "")
    assert(normalizeAnswer("...") == "")
    assert(normalizeAnswer("A: x") == "x")
    assert(normalizeAnswer("Answer is (the) BEST-one!") == "answer is bestone")
    assert(normalizeAnswer("  spaces   everywhere  ") == "spaces everywhere")
  }

  test("normalize: unicode untouched (accents survive, Unicode \\b articles)") {
    assert(normalizeAnswer("thé café") == "thé café")
  }

  // EM_compute (utils.py:309-310)
  test("EM: normalized equality, max over golds") {
    assert(emCompute(Seq("apple"), "the apple.") == 1)
    assert(emCompute(Seq("apple"), "apples") == 0)
    assert(emCompute(Seq("thé"), "The thé!") == 1)
    assert(emCompute(Seq("a b"), "b a") == 1) // both normalize to "b"
    assert(emCompute(Seq(""), "") == 1)
    assert(emCompute(Seq("x or y"), "y") == 0) // no expansion inside EM itself
  }

  // F1_compute (utils.py:313-332)
  test("F1: token-bag, both-empty rule (quirk 4), max over golds") {
    assert(math.abs(tokenF1(Seq("the cat sat"), "cat sat mat") - 0.8) < 1e-12)
    assert(tokenF1(Seq(""), "") == 1.0)
    assert(tokenF1(Seq(""), "x") == 0.0)
    assert(math.abs(tokenF1(Seq("a b c"), "a a b") - 0.6666666666666666) < 1e-12)
    assert(tokenF1(Seq("x y"), "x y") == 1.0)
    assert(math.abs(tokenF1(Seq("apple pie", "cherry pie"), "apple cherry pie") - 0.8) < 1e-12)
  }

  // has_answer token containment (utils.py:16-199 live path)
  test("tokensContain: NFD tokenize, contiguous subsequence") {
    assert(tokensContain(Seq("apple"), "I like Apple pie"))
    assert(!tokensContain(Seq("apple pie"), "applepie here"))
    assert(tokensContain(Seq("thé"), "the the thé!"))
    assert(tokensContain(Seq("naïve"), "a NAÏVE idea"))
    assert(!tokensContain(Seq("New York"), "new-york city")) // '-' is its own token
    assert(!tokensContain(Seq("中文"), "这是中文测试")) // CJK: whole run is one token
    assert(tokensContain(Seq(""), "anything")) // empty answer matches trivially
    assert(!tokensContain(Seq("x"), ""))
    assert(!tokensContain(Seq("café"), "cafe time")) // NFD keeps the accent
    assert(tokensContain(Seq("U.S."), "the U.S. economy")) // dots tokenize singly
  }

  // match's raw-substring has_answer (utils.py:403-407, quirk 2)
  test("substrHasAnswer: raw substring, case-sensitive") {
    assert(substrHasAnswer(Seq("apple"), "the apple."))
    assert(!substrHasAnswer(Seq("Apple"), "the apple."))
    assert(!substrHasAnswer(Seq("x"), null))
  }

  test("refusal markers: 24 phrases, token-wise") {
    assert(RefusalMarkers.size == 24)
    assert(tokensContain(RefusalMarkers, "I'm sorry, I cannot answer that"))
    assert(tokensContain(RefusalMarkers, "It is partially correct to say so"))
    assert(tokensContain(RefusalMarkers, "unknown"))
    assert(!tokensContain(RefusalMarkers, "The capital is Paris"))
  }
}
