package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests per SURVEY §5.2.3 — raw scalacheck generators driven by
  * a deterministic seed loop (the scalatest/scalacheck bridge artifact is
  * not in the offline cache). */
class PropertiesSpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val text: Gen[String] = Gen.asciiPrintableStr
  private val words: Gen[String] =
    Gen.listOf(Gen.oneOf("the", "cat", "sat", "a", "naïve", "x1", "Big", "thé"))
      .map(_.mkString(" "))

  test("normalize is idempotent") {
    forAllSamples(text) { s =>
      val n = TextKernels.normalizeAnswer(s)
      assert(TextKernels.normalizeAnswer(n) == n, s"input: ${s.take(40)}")
    }
  }

  test("EM is reflexive for strings with nonempty normalization") {
    forAllSamples(words) { s =>
      if (TextKernels.normalizeAnswer(s).nonEmpty)
        assert(TextKernels.emCompute(Seq(s), s) == 1)
    }
  }

  test("F1 in [0,1] and symmetric in (gold, pred)") {
    forAllSamples(Gen.zip(words, words)) { case (a, b) =>
      val f = TextKernels.tokenF1(Seq(a), b)
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f - TextKernels.tokenF1(Seq(b), a)) < 1e-12)
    }
  }

  test("RougeL recall in [0,1]; 1 when ref tokens subsequence of pred") {
    forAllSamples(Gen.zip(words, words)) { case (a, b) =>
      val r = TextKernels.rougeLRecall(Seq(a), b)
      assert(r >= 0.0 && r <= 1.0)
    }
    forAllSamples(words) { a =>
      if (TextKernels.rougeTokenize(a).nonEmpty)
        assert(TextKernels.rougeLRecall(Seq(a), a + " " + a) == 1.0)
    }
  }

  test("tokensContain: any string token-contains itself when it has tokens") {
    forAllSamples(words) { s =>
      if (TextKernels.simpleTokenize(s).nonEmpty)
        assert(TextKernels.tokensContain(Seq(s), s))
    }
  }

  test("tokensContain implies token-joined substring containment") {
    forAllSamples(Gen.zip(words, words)) { case (a, t) =>
      if (TextKernels.tokensContain(Seq(a), t) &&
        TextKernels.simpleTokenize(a).nonEmpty) {
        val at = TextKernels.simpleTokenize(a).mkString(" ")
        val tt = TextKernels.simpleTokenize(t).mkString(" ")
        assert(tt.contains(at))
      }
    }
  }

  test("simhash and fingerprint are pure functions of the token stream") {
    forAllSamples(Gen.listOf(Gen.alphaNumStr), n = 100) { toks =>
      assert(graft.ops.Dedup.simhash64(toks) == graft.ops.Dedup.simhash64(toks))
      assert(graft.ops.TextAnalysis.fingerprintKernel(toks) ==
        graft.ops.TextAnalysis.fingerprintKernel(toks))
    }
  }
}
