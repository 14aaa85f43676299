package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Expected values observed by executing the reference parsers
  * (`utils.py:202-283,368-393`) on these inputs. Where the reference's
  * Python-set iteration order is nondeterministic, our deterministic
  * sorted order is asserted instead (documented deviation, SURVEY §2.4
  * quirk 6) — the *set* of items always matches the reference. */
class ParseKernelsSpec extends AnyFunSuite {
  import ParseKernels._

  test("answerFromText: delete ##..## spans, strip") {
    assert(answerFromText("a ## ev1 ## b ## ev2 ## c") == "a  b  c")
    assert(answerFromText("no spans here") == "no spans here")
    assert(answerFromText("## only ##") == "")
  }

  test("evidenceFromText: last ##-group wins") {
    assert(evidenceFromText("a ## ev1 ## b ## ev2 ## c") == "ev2")
  }

  test("evidenceFromText: multi-Passage 9-char slices, dedup (sorted — deviation)") {
    // reference (set order): "Passage-2, Passage-1"; ours sorts
    assert(evidenceFromText("Passage-1 and Passage-2 are both relevant") == "Passage-1, Passage-2")
    // multi-digit ids truncate to 9 chars (quirk 6): {Passage-1, Passage-3}
    assert(evidenceFromText("Passage-12 and Passage-34 and Passage-12") == "Passage-1, Passage-3")
    assert(evidenceFromText("Passage-1, Passage-1 again") == "Passage-1")
  }

  test("evidenceFromText: single Passage slice; fallback to whole text") {
    assert(evidenceFromText("see Passage-7.") == "Passage-7")
    assert(evidenceFromText("plain text") == "plain text")
    // idx+9 == length: slice fails, whole sentence (reference behavior)
    assert(evidenceFromText("tail Passage-9") == "tail Passage-9")
  }

  test("extractAnsEvi: answer before first Evidence:, evidence after last") {
    assert(extractAnsEvi("Answer: foo Evidence: bar") == (("foo", "bar")))
    assert(extractAnsEvi("Answer: foo") == (("foo", "foo")))
    assert(extractAnsEvi("x Evidence: y Evidence: z") == (("x", "z")))
  }

  test("dealPrediction: null -> reject/null; prefix strip; markers; split") {
    assert(dealPrediction(null) == Parsed(reject = true, null, null))
    assert(dealPrediction("Answer: apple.\nEvidence: ## Passage-0, Passage-1 ##.") ==
      Parsed(reject = false, "apple.", "Passage-0, Passage-1"))
    assert(dealPrediction("answer: I'm sorry, I cannot answer that") ==
      Parsed(reject = true, "I'm sorry, I cannot answer that", "I'm sorry, I cannot answer that"))
    // reference set order "Passage-2, Passage-3" happens to be sorted here
    assert(dealPrediction("The capital is Paris. Evidence: Passage-2 says so and Passage-3 too") ==
      Parsed(reject = false, "The capital is Paris.", "Passage-2, Passage-3"))
    assert(dealPrediction("ANSWER: yes") == Parsed(reject = false, "yes", "yes"))
    assert(dealPrediction("unknown") == Parsed(reject = true, "unknown", "unknown"))
  }

  test("dealFusion: live substring semantics (dead $$ regex, quirk 1)") {
    assert(dealFusion("$$ keep $$") == "keep")
    assert(dealFusion("keep it") == "keep")
    assert(dealFusion("I would discard") == "discard")
    assert(dealFusion("KEEP") == "discard") // case-sensitive
    assert(dealFusion("keeping stuff") == "keep") // substring, not word
    assert(dealFusion(null) == "discard")
  }

  test("dealFusionProbability: first float, else first int-dot, else 0") {
    assert(dealFusionProbability("probability: 0.85") == 0.85)
    assert(dealFusionProbability("Probability: 0.9.") == 0.9)
    assert(dealFusionProbability("7.") == 7.0)
    assert(dealFusionProbability("0.5 or 0.7") == 0.5)
    assert(dealFusionProbability("garbage") == 0.0)
    assert(dealFusionProbability("3") == 0.0) // no dot -> no match
    assert(dealFusionProbability("probability: 85%") == 0.0)
    assert(dealFusionProbability(null) == 0.0)
  }

  test("str2paras and ngrams text-lib utilities") {
    assert(str2paras("a\n\n b \n") == Seq(": a", ":  b "))
    assert(ngrams(Seq("a", "b", "c"), 2) == Seq("a", "a b", "b", "b c", "c"))
  }
}
