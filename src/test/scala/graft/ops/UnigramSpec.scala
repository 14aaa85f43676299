package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Unigram-LM tokenizer induction: hand-computed Viterbi cases, the
  * exact-integer tie-break order, and the determinism contracts that
  * justify q181/q182's fixture oracles (the BpeSpec discipline). */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("segmentWord picks the maximum-likelihood split (hand case)") {
    // counts: ab=10 c=5 a=3 b=2, C=20. "abc" as [ab,c]: prod=50,k=2;
    // as [a,b,c]: prod=30,k=3. 50*20^3 > 30*20^2 -> [ab,c].
    val counts = Map("ab" -> 10L, "c" -> 5L, "a" -> 3L, "b" -> 2L)
    assert(Unigram.segmentWord("abc", counts, BigInt(20)).toSeq ==
      Seq("ab", "c"))
  }

  test("tie-break: equal likelihood and piece count keeps the longer last piece") {
    // "abc" as [ab,c] (prod 8, k 2) vs [a,bc] (prod 8, k 2): the doc'd
    // total order keeps the longer LAST piece -> [a,bc].
    val counts = Map("ab" -> 4L, "bc" -> 4L, "a" -> 2L, "b" -> 2L, "c" -> 2L)
    assert(Unigram.segmentWord("abc", counts, BigInt(14)).toSeq ==
      Seq("a", "bc"))
  }

  test("fewer pieces beat more pieces at equal likelihood") {
    // "ab" as [ab] (prod 4, k 1) vs [a,b] (prod 4, k 2): 4*C^2 > 4*C^1
    // only if C>1 and we cross-multiply correctly -> [ab] must win.
    val counts = Map("ab" -> 4L, "a" -> 2L, "b" -> 2L)
    assert(Unigram.segmentWord("ab", counts, BigInt(8)).toSeq == Seq("ab"))
  }

  test("surrogate pairs stay whole; OOV single chars fall back to the floor") {
    // U+1F600 is a UTF-16 surrogate pair — never split mid-pair
    val counts = Map("a" -> 5L)
    assert(Unigram.segmentWord("a😀", counts, BigInt(5)).toSeq ==
      Seq("a", "😀"))
    assert(Unigram.charsOf("a😀b") == Seq("a", "😀", "b"))
    // empty word segments to nothing
    assert(Unigram.segmentWord("", counts, BigInt(5)).isEmpty)
  }

  test("every character of the corpus is encodable (char floor in the vocab)") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val vocab = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 500, rounds = 2)
    val pieces = vocab.map(_.piece).toSet
    import spark.implicits._
    val chars = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .as[String].collect().iterator
      .flatMap(Unigram.charsOf).toSet
    val missing = chars.diff(pieces)
    assert(missing.isEmpty, s"chars dropped from the vocab: $missing")
  }

  test("encoding with the corpus' own vocabulary is lossless") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val vocab = Unigram.learnVocab(docs, "text", vocabSize = 96,
      seedSize = 1000, rounds = 3)
    val counts = vocab.map(p => p.piece -> p.count).toMap
    val total = counts.valuesIterator.map(BigInt(_)).sum
    import spark.implicits._
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    for (w <- words if w.nonEmpty)
      assert(Unigram.segmentWord(w, counts, total).mkString == w,
        s"lossy encode for '$w'")
  }

  test("determinism: identical vocabulary across repeated runs and parallelisms") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val a = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 500, rounds = 2)
    val b = Unigram.learnVocab(docs.repartition(13), "text", vocabSize = 64,
      seedSize = 500, rounds = 2)
    assert(a == b, s"vocabulary depends on partitioning:\n$a\nvs\n$b")
  }

  test("distributed and driver-local EM produce the identical vocabulary") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val local = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 500, rounds = 2)
    val dist = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 500, rounds = 2, driverWordBound = 0L)
    assert(local == dist, s"venue changed the result:\n$local\nvs\n$dist")
  }

  test("venue ROUTING at the boundary: a word table that naturally " +
    "exceeds driverWordBound learns distributed with identical pieces " +
    "(round-15 verdict item 6 — not the forced bound-0 shortcut)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 distinct synthetic words, ~3 occurrences each — the corpus the
    // router sees is a 60-row word table, so driverWordBound = 50 puts
    // this corpus ABOVE the bound and the distributed arm is selected
    // by the production routing rule itself
    val docs = spark.range(0, 180)
      .select(col("id"), concat(lit("tok"), pmod(col("id") * 7L, lit(60L)),
        lit("x"), pmod(col("id"), lit(3L))).as("w"))
      .groupBy(pmod(col("id"), lit(20L)).as("g"))
      .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
    val nWords = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).select("w").distinct().count()
    assert(nWords > 50,
      s"probe corpus must exceed the test bound (got $nWords words)")
    val viaDist = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 300, rounds = 2, driverWordBound = 50L)
    val viaDriver = Unigram.learnVocab(docs, "text", vocabSize = 64,
      seedSize = 300, rounds = 2, driverWordBound = 1000000L)
    assert(viaDist == viaDriver,
      s"crossing the venue boundary changed the pieces:\n$viaDist\nvs\n$viaDriver")
  }

  test("learnVocab releases its persisted word table (no cache leak)") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val before = spark.sharedState.cacheManager.isEmpty
    Unigram.learnVocab(docs, "text", vocabSize = 16, seedSize = 100,
      rounds = 1, driverWordBound = 0L)
    assert(spark.sharedState.cacheManager.isEmpty || !before,
      "persisted word table leaked out of learnVocab")
  }
}
