package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BPE merge learning: the classic hand-computed example, kernel edge
  * cases, and the determinism contract that justifies q121's fixture
  * oracle. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("classic corpus: first merges match the hand computation") {
    import spark.implicits._
    // Sennrich's running example shape: low ×5, lowest ×2, newer ×6,
    // wider ×3. Pair counts over word frequencies:
    //   (e,r</w>) = newer 6 + wider 3 = 9  <- argmax
    //   then (er</w> forms), next best (l,o) = 5 + 2 = 7
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" ")
    val df = Seq(docs).toDF("text")
    val merges = Bpe.learnMerges(df, "text", nMerges = 4)
    assert(merges.head.left == "e" && merges.head.right == "r" &&
      merges.head.pair_count == 9L, merges.head)
    assert(merges(1).left == "er" && merges(1).right == Bpe.EndOfWord &&
      merges(1).pair_count == 9L, merges(1))
    assert(merges(2).left == "l" && merges(2).right == "o" &&
      merges(2).pair_count == 7L, merges(2))
    // ranks are 1-based and dense
    assert(merges.map(_.rank) == (1 to merges.size))
  }

  test("symbol kernel: code points (surrogate-safe) + end-of-word; merge is left-to-right non-overlapping") {
    assert(Bpe.toSymbols("ab").toSeq == Seq("a", "b", "</w>"))
    // U+1F600 is a surrogate pair in UTF-16 — must stay one symbol
    assert(Bpe.toSymbols("a😀").toSeq == Seq("a", "😀", "</w>"))
    // aaa with merge (a,a): left-to-right non-overlapping -> (aa, a)
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
  }

  test("determinism: identical merge table across repeated runs and parallelisms") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val a = Bpe.learnMerges(docs, "text", nMerges = 8)
    val b = Bpe.learnMerges(docs.repartition(13), "text", nMerges = 8)
    assert(a == b, s"merge table depends on partitioning:\n$a\nvs\n$b")
  }

  test("encodeWord replays merges in rank order (classic hand case)") {
    val merges = Array(("l", "o"), ("lo", "w"), ("low", "</w>"))
    assert(Bpe.encodeWord("low", merges).toSeq == Seq("low</w>"))
    // partial coverage: 'lower' fuses the learned prefix, leaves the tail
    assert(Bpe.encodeWord("lower", merges).toSeq == Seq("low", "e", "r", "</w>"))
    // untouched word: character symbols + end-of-word survive
    assert(Bpe.encodeWord("hi", Array.empty).toSeq == Seq("h", "i", "</w>"))
  }

  test("encoding with the corpus' own merge table is lossless") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 48)
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    import spark.implicits._
    val words = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    for (w <- words if w.nonEmpty)
      assert(Bpe.encodeWord(w, pairs).mkString == w + Bpe.EndOfWord,
        s"lossy encode for '$w'")
  }

  test("distributed and driver-local loops produce the identical merge table") {
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val local = Bpe.learnMerges(docs, "text", nMerges = 8)
    val dist = Bpe.learnMerges(docs, "text", nMerges = 8, driverVocabBound = 0L)
    assert(local == dist, s"venue changed the result:\n$local\nvs\n$dist")
  }

  test("learnMerges releases its persisted base table (no cache leak)") {
    // the distributed branch persists the word-frequency table; a long-
    // lived driver calling learnMerges repeatedly must not accumulate one
    // cached table per call
    val docs = graft.rel.Tables.load(spark, SparkTestBase.Sf0001, "documents")
    val before = spark.sharedState.cacheManager.isEmpty
    Bpe.learnMerges(docs, "text", nMerges = 3, driverVocabBound = 0L)  // checkpoint never reached
    Bpe.learnMerges(docs, "text", nMerges = 8, driverVocabBound = 0L)  // checkpoint at r=5
    assert(spark.sharedState.cacheManager.isEmpty || !before,
      "persisted base word table leaked out of learnMerges")
  }
}
