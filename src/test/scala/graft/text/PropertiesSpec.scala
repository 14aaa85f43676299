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

  test("minhash signature of a union is the elementwise min of the parts") {
    // the algebraic property banded LSH relies on: each slot is a min over
    // per-shingle hashes, so sig(A ++ B) = min(sig(A), sig(B)) slotwise
    val shingleGen = Gen.listOf(Gen.oneOf("a b c", "b c d", "x y z", "q w e", "m n o"))
    forAllSamples(Gen.zip(shingleGen, shingleGen), n = 150) { case (a, b) =>
      val k = 12
      val sa = graft.ops.Dedup.minhashSignature(a, k)
      val sb = graft.ops.Dedup.minhashSignature(b, k)
      val su = graft.ops.Dedup.minhashSignature(a ++ b, k)
      (0 until k).foreach { i =>
        assert(su(i) == math.min(sa(i), sb(i)), s"slot $i")
      }
    }
  }

  test("identical minhash signatures for permuted shingle sets; shingles consistent") {
    forAllSamples(Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty)), n = 100) { toks =>
      val s1 = graft.ops.Dedup.minhashSignature(toks, 8)
      val s2 = graft.ops.Dedup.minhashSignature(scala.util.Random.javaRandomToRandom(
        new java.util.Random(1)).shuffle(toks), 8)
      assert(s1.toSeq == s2.toSeq) // order-insensitive (min-reduction)
      // hash-domain and string-domain shingles agree on arbitrary text
      def fnv(s: String): Long = {
        var h = 0xcbf29ce484222325L
        s.foreach { c => h ^= c; h *= 0x100000001b3L }
        h
      }
      val text = toks.mkString(" ")
      assert(graft.ops.Dedup.shingleHashes(text, 2).toSeq ==
        graft.ops.Dedup.shinglesFromText(text, 2).map(fnv).toSeq)
    }
  }
}
